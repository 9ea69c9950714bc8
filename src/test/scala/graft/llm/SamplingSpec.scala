package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stratified sampling: determinism, rate accuracy, stratum isolation. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  test("sample is deterministic and respects per-stratum rates") {
    def run() = Sampling.stratified(docs, col("doc_id"), col("lang"),
        Map("en" -> 0.5, "de" -> 0.1), default = 0.0)
      .select("doc_id").as[Long].collect().toSet
    val a = run(); val b = run()
    assert(a == b) // seeded hash: no RNG state anywhere
    val byLang = Sampling.stratified(docs, col("doc_id"), col("lang"),
        Map("en" -> 0.5, "de" -> 0.1), default = 0.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // default 0.0: no stratum outside the rate map survives
    assert(byLang.keySet.subsetOf(Set("en", "de")))
    // measured fraction within a loose tolerance of the configured rate
    val enFrac = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(math.abs(enFrac - 0.5) < 0.25, s"en fraction $enFrac")
    assert(byLang.getOrElse("de", 0L) <= totals("de"))
  }

  test("rate 1.0 keeps every row; rate 0.0 keeps none") {
    val all = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Map.empty, default = 1.0).count()
    assert(all == docs.count())
    val none = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Map.empty, default = 0.0).count()
    assert(none == 0L)
  }

  test("upsample: weights repeat, thin, and stay deterministic") {
    val up = Sampling.upsampleByStratum(docs, col("doc_id"), col("lang"),
        Map("en" -> 2.0, "de" -> 0.5), default = 1.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(up("en") == totals("en") * 2) // integer weight: exact repeat
    assert(up("de") <= totals("de"))     // fractional: thinned
    // every kept row carries a dense 0-based copy_idx
    val idx = Sampling.upsampleByStratum(docs, col("doc_id"), col("lang"),
        Map("en" -> 2.0), default = 1.0)
      .where(col("lang") === "en")
      .groupBy("doc_id").agg(collect_set("copy_idx").as("s"))
      .select(col("s")).as[Seq[Long]].collect()
    assert(idx.forall(_.sorted == Seq(0L, 1L)))
  }

  test("sequence packing tiles the token stream exactly") {
    val packed = Sampling.packSequences(docs, budget = 128, numBuckets = 4)
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._3)) // by (seq_id, seq_offset) -- wrong order fields
    val byStart = Sampling.packSequences(docs, budget = 128, numBuckets = 4)
      .select(col("doc_id"), col("n_tokens"),
        col("seq_id") * 128 + col("seq_offset"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // starts form a contiguous token stream: each doc starts where the
    // previous one ended
    byStart.foldLeft(0L) { case (expected, (_, n, start)) =>
      assert(start == expected, s"gap at $start (expected $expected)")
      start + n
    }
    // determinism
    val again = Sampling.packSequences(docs, budget = 128, numBuckets = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(packed.toSet == again)
    // offsets always inside the budget
    assert(packed.forall(r => r._4 >= 0 && r._4 < 128))
  }

  test("sample plan is a pure scan-level filter (no shuffle)") {
    val df = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.5), default = 0.1)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty)
  }

  test("mixture by budget: prefix semantics, budget bound, monotonicity") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    def run(budget: Long) =
      Sampling.mixtureByBudget(docs, col("doc_id"), col("lang"),
        Map("en" -> budget, "fr" -> 500L))
        .select("doc_id", "domain", "n_tokens", "cum_tokens", "kept")
        .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    val out = run(2000L)
    // every document scored, exactly once
    assert(out.size == docs.count())
    // unbudgeted domains are scored but never kept
    assert(out.filter(r => r._2 != "en" && r._2 != "fr").forall(!_._5))
    out.groupBy(_._2).foreach { case (dom, rows) =>
      val budget = dom match {
        case "en" => 2000L; case "fr" => 500L; case _ => 0L
      }
      val kept = rows.filter(_._5)
      // kept tokens within budget; kept set is the cum_tokens prefix
      assert(kept.map(_._3).sum <= budget, s"$dom over budget")
      val maxKept = if (kept.isEmpty) 0L else kept.map(_._4).max
      assert(rows.filterNot(_._5).forall(_._4 > maxKept), s"$dom not prefix")
      // cum_tokens is a proper running total: max == domain token sum
      assert(rows.map(_._4).max == rows.map(_._3).sum, s"$dom cum broken")
    }
    // a larger budget strictly extends the selection (stable order)
    val small = run(1000L).filter(r => r._5 && r._2 == "en").map(_._1).toSet
    val large = run(2000L).filter(r => r._5 && r._2 == "en").map(_._1).toSet
    assert(small.subsetOf(large))
  }

  test("shuffleOrder is a dense deterministic permutation, epoch-varying") {
    def run(seed: Int) = Sampling.shuffleOrder(docs, col("doc_id"),
        numBuckets = 8, seed = seed)
      .select("id", "ord").as[(Long, Long)].collect()
    val e0 = run(37)
    val n = docs.count()
    assert(e0.length == n)
    assert(e0.map(_._2).sorted.toSeq == (0L until n)) // dense 0..n-1
    assert(run(37).toSet == e0.toSet) // deterministic
    // a different epoch seed yields a genuinely different permutation
    val e1 = run(38).toMap
    val moved = e0.count { case (id, ord) => e1(id) != ord }
    assert(moved > n / 2, s"only $moved moved")
  }

  test("temperatureSampled derives flatter-than-proportional rates") {
    val out = Sampling.temperatureSampled(docs, col("doc_id"), col("lang"),
        c = 2.5, alpha = 0.5)
      .select("id", "stratum", "n_stratum", "threshold_bp", "kept")
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(out.size == docs.count()) // audit shape: every row scored
    val totals = docs.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    val byLang = out.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val n = totals(lang)
      // threshold = min(10000, floor(25000/sqrt(n))) exactly
      val expect = math.min(10000L, math.floor(25000.0 / math.sqrt(n.toDouble)).toLong)
      assert(rows.forall(_._4 == expect), s"$lang threshold")
      assert(rows.forall(_._3 == n), s"$lang count")
    }
    // α < 1 flattens: the keep RATE of the smallest stratum is >= the
    // keep rate of the largest (inverse-sqrt thresholds)
    val smallest = totals.minBy(_._2)._1
    val largest = totals.maxBy(_._2)._1
    val rate = (l: String) => byLang(l).head._4
    assert(rate(smallest) >= rate(largest))
    // deterministic
    val again = Sampling.temperatureSampled(docs, col("doc_id"), col("lang"),
        c = 2.5, alpha = 0.5)
      .select("id", "kept").as[(Long, Boolean)].collect().toSet
    assert(again == out.map(r => (r._1, r._5)).toSet)
  }

  test("q139: cluster-balanced sample scores every vector over k-means strata") {
    val out = graft.queries.LlmQueries.clusterBalancedSample(spark, Sf0001)
      .select("vec_id", "cid", "n_stratum", "threshold_bp", "kept")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    val nVecs = spark.read.parquet(s"$Sf0001/embeddings.parquet").count()
    assert(out.size == nVecs) // audit shape over the whole corpus
    // strata are exactly the q77 assignment cells
    val cells = out.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    out.foreach { case (v, cid, n, thr, _) =>
      assert(n == cells(cid), s"vec $v cell-count")
      val expect = math.min(10000L,
        math.floor(25000.0 / math.sqrt(n.toDouble)).toLong)
      assert(thr == expect, s"vec $v threshold")
    }
    // flattening: smaller cells keep at a >= threshold than bigger cells
    val thrOf = out.groupBy(_._2).view.mapValues(_.head._4).toMap
    val smallest = cells.minBy(_._2)._1
    val largest = cells.maxBy(_._2)._1
    assert(thrOf(smallest) >= thrOf(largest))
  }

  test("bottomKPerKey: membership, partition independence, mergeability") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    def sample(df: org.apache.spark.sql.DataFrame) =
      Sampling.bottomKPerKey(df, col("source"), col("doc_id"), k = 5)
        .select("source", "doc_id", "rn")
        .as[(String, Long, Int)].collect().toSet
    val s1 = sample(docs)
    // 20 sources × k — every source at sf0.001 has ≥ 5 docs
    assert(s1.size == 20 * 5)
    // pure function of ids: identical under any repartitioning
    assert(sample(docs.repartition(13)) == s1)
    // mergeability: bottom-k of per-shard bottom-k's == global bottom-k
    val shardA = docs.where(col("doc_id") % 2 === 0)
    val shardB = docs.where(col("doc_id") % 2 === 1)
    val merged = Sampling.bottomKPerKey(
      Sampling.bottomKPerKey(shardA, col("source"), col("doc_id"), k = 5)
        .select(docs.columns.map(col): _*)
        .union(Sampling.bottomKPerKey(shardB, col("source"), col("doc_id"),
          k = 5).select(docs.columns.map(col): _*)),
      col("source"), col("doc_id"), k = 5)
      .select("source", "doc_id", "rn").as[(String, Long, Int)].collect().toSet
    assert(merged == s1)
  }

  test("bottom-k Jaccard estimator tracks true Jaccard on known overlap") {
    // two "sources" sharing exactly half their elements: J = 1/3
    import org.apache.spark.sql.expressions.Window
    val n = 2000
    val a = (0 until n).map(i => ("a", s"w$i"))
    val b = (n / 2 until n + n / 2).map(i => ("b", s"w$i"))
    val k = 64
    val sk = (a ++ b).toDF("source", "w")
      .select(col("source"),
        graft.llm.PortableSeededHash.hash(col("w"), 52).as("h"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy("source").orderBy("h")))
      .where(col("rn") <= k)
      .groupBy("source").agg(sort_array(collect_list("h")).as("hs"))
    val Seq(ha, hb) = sk.orderBy("source").select("hs")
      .as[Seq[Long]].collect().toSeq
    val union = (ha ++ hb).distinct.sorted.take(k).toSet
    val hits = union.count(h => ha.contains(h) && hb.contains(h))
    val est = hits.toDouble / k
    assert(math.abs(est - 1.0 / 3) < 0.15, s"est=$est expected ~0.333")
  }

  test("bottomKPerKey: KMV estimate is sane and NULL below k rows") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val est = Sampling.bottomKPerKey(docs, col("source"), col("doc_id"),
        k = 8)
      .groupBy("source").agg(first("est_distinct").as("est"),
        count(lit(1)).as("n"))
      .as[(String, Option[Long], Long)].collect()
    est.foreach { case (src, e, _) =>
      val exact = docs.where(col("source") === src).count()
      assert(e.isDefined, s"$src estimate missing")
      // KMV with k=8 is coarse; just bound the relative error loosely
      assert(e.get > 0 && e.get < exact * 20, s"$src est=${e.get} n=$exact")
    }
    // a key with fewer than k rows: estimator undefined → NULL
    val tiny = Sampling.bottomKPerKey(
      docs.where(col("doc_id") < 3), col("source"), col("doc_id"), k = 8)
      .select("est_distinct").as[Option[Long]].collect()
    assert(tiny.nonEmpty && tiny.forall(_.isEmpty))
  }

  test("packedBatches: full budget everywhere but the tail, and the " +
      "concatenation identity reproduces the canonical token stream") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val out = Sampling.packedBatches(docs, budget = 512)
      .as[(Long, Long, Long, String, String)].collect()
      .sortBy(_._1).toList
    assert(out.map(_._1) == out.indices.map(_.toLong)) // dense seq ids
    // every sequence is exactly 512 tokens except the last
    out.init.foreach { case (id, _, n, _, txt) =>
      assert(n == 512 && txt.split(" ").length == 512, s"seq $id")
    }
    assert(out.last._3 <= 512)
    // boundaries are strictly increasing within [0, 512)
    out.foreach { case (id, nPieces, _, bs, _) =>
      val offs = if (bs.isEmpty) Nil else bs.split("\\|").map(_.toLong).toList
      assert(offs == offs.sorted && offs.forall(o => o >= 0 && o < 512))
      assert(offs.size <= nPieces)
    }
    // concatenating all sequences reproduces the canonical-order stream
    val stream = out.map(_._5).mkString(" ")
    val canonical = Sampling.packSequences(docs, 512)
      .withColumn("start", col("seq_id") * 512 + col("seq_offset"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .orderBy("start").select("text").as[String].collect().mkString(" ")
    assert(stream == canonical)
  }

  test("fimTransform: segment splice reconstructs the original text") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet").limit(60)
    val out = Sampling.fimTransform(docs, fimPct = 100)
      .join(docs.select("doc_id", "text"), "doc_id")
      .as[(Long, Boolean, Long, String, String)].collect()
    assert(out.length == 60 && out.forall(_._2)) // rate 100 → all FIM
    out.foreach { case (id, _, nTok, fim, text) =>
      val pre = fim.indexOf("<PRE>"); val suf = fim.indexOf("<SUF>")
      val mid = fim.indexOf("<MID>")
      assert(pre == 0 && suf > 0 && mid > suf, s"doc $id PSM order")
      def seg(s: Int, e: Int) = fim.substring(s, e).trim
      val rebuilt = Seq(seg(5, suf), seg(mid + 5, fim.length),
        seg(suf + 5, mid)).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == text, s"doc $id reconstructs")
      assert(text.split(" ").length.toLong == nTok)
    }
    // rate 0 → identity
    val none = Sampling.fimTransform(docs, fimPct = 0)
      .join(docs.select("doc_id", "text"), "doc_id")
      .as[(Long, Boolean, Long, String, String)].collect()
    assert(none.forall(r => !r._2 && r._4 == r._5))
  }

  test("spanCorruption: rate 0 is identity, rate 100 is one full span") {
    val docs = Seq((7L, "a b c d")).toDF("doc_id", "text")
    val none = Sampling.spanCorruption(docs, ratePct = 0)
      .as[(Long, String, String, Long, Long)].collect().head
    assert(none == ((7L, "a b c d", "", 0L, 0L)))
    val all = Sampling.spanCorruption(docs, ratePct = 100)
      .as[(Long, String, String, Long, Long)].collect().head
    assert(all == ((7L, "<X0>", "<X0> a b c d", 1L, 4L)))
  }

  test("spanCorruption: sentinel splice reconstructs the original text") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet").limit(50)
    val out = Sampling.spanCorruption(docs, ratePct = 15)
      .join(docs.select("doc_id", "text"), "doc_id")
      .as[(Long, String, String, Long, Long, String)].collect()
    assert(out.length == 50)
    out.foreach { case (id, inp, tgt, nSpans, nMasked, text) =>
      // parse target "<X0> t t <X1> t ..." into span -> tokens
      val spans = ("<X(\\d+)>".r).split(tgt).drop(1)
        .map(_.trim).zipWithIndex.map { case (s, i) => i -> s }.toMap
      assert(spans.size == nSpans, s"doc $id")
      assert(spans.values.map(s =>
        if (s.isEmpty) 0 else s.split(" ").length).sum == nMasked)
      val rebuilt = ("<X(\\d+)>".r).replaceAllIn(inp,
        m => java.util.regex.Matcher.quoteReplacement(
          spans(m.group(1).toInt)))
      assert(rebuilt == text, s"doc $id reconstructs")
    }
  }

  test("spanCorruption is partitioning-independent") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet").limit(40)
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.spanCorruption(d, ratePct = 15)
        .as[(Long, String, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(docs.repartition(17)) == run(docs.coalesce(1)))
  }

  test("weightedSample: heavy weights dominate, k > n ranks all, " +
    "partitioning-independent") {
    val rows = (1L to 100L).map(i => (i, 1L)) :+ (999L, 1000000L)
    def run(parts: Int, k: Int) =
      Sampling.weightedSample(
          rows.toDF("doc_id", "w").repartition(parts),
          col("doc_id"), col("w"), k)
        .select("rn", "id").as[(Long, Long)].collect().toSeq.sorted
    // weight 10^6 vs 1: u^(1/w) ~ 1 for the heavy row — it must be in
    // (in fact, atop) any small sample under this fixed seed
    assert(run(1, 10).map(_._2).contains(999L))
    assert(run(1, 10).head == ((1L, 999L)))
    assert(run(7, 10) == run(1, 10))
    assert(run(3, 500).size == 101)
  }

  test("globalRankDesc == global-window rank, incl. ties and negatives") {
    import org.apache.spark.sql.expressions.Window
    // values with duplicates (tie-break on id) spanning negative bins
    val rows = (0L until 500L).map { i =>
      (i, ((i * 37) % 101) - 50) // duplicated values in [-50, 50]
    }.toDF("doc_id", "v")
    val got = Sampling.globalRankDesc(rows, col("v"),
        expr("v div 7"), col("doc_id"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val want = rows.withColumn("rank",
        row_number().over(Window.orderBy(col("v").desc, col("doc_id")))
          .cast("long"))
      .orderBy("doc_id").select("doc_id", "rank")
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("globalRankDesc fails loudly when bin violates the monotone-" +
    "coarsening contract") {
    val rows = (0L until 100L).map(i => (i, i)).toDF("doc_id", "v")
    // pmod(v, 3) interleaves values across bins — not a coarsening
    val bad = Sampling.globalRankDesc(rows, col("v"),
      expr("pmod(v, 3)"), col("doc_id"))
    val e = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m =>
      m != null && m.contains("monotone")), s"unexpected error: $e")
  }

  test("unimax: water-filling allocation matches a hand-computed " +
    "fill, kept prefixes respect allocations, epoch-major repeats") {
    // 4 langs, 1 doc each for hand-math clarity: tokens 10/10/20/100
    val rows = Seq(
      (1L, "aa", ("t " * 10).trim),
      (2L, "bb", ("t " * 10).trim),
      (3L, "cc", ("t " * 20).trim),
      (4L, "dd", ("t " * 100).trim)).toDF("doc_id", "lang", "text")
    // total = 140, budget = 140*1/1 = 140, epochs = 2 ->
    // capacities asc: aa 20, bb 20, cc 40, dd 200
    // k=1: share 140/4 = 35 >= 20 -> aa takes 20
    // k=2: (140-20)/3 = 40 >= 20 -> bb takes 20
    // k=3: (140-40)/2 = 50 >= 40 -> cc takes 40
    // k=4: (140-80)/1 = 60 <  200 -> dd share-limited to 60
    val out = Sampling.unimax(rows, col("doc_id"), col("lang"),
        budgetNumer = 1L, budgetDenom = 1L, epochs = 2)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("aa") == (("aa", 1L, 10L, 20L, 20L, 2L, 20L)))
    assert(out("bb") == (("bb", 1L, 10L, 20L, 20L, 2L, 20L)))
    assert(out("cc") == (("cc", 1L, 20L, 40L, 40L, 2L, 40L)))
    // dd: alloc 60 fits 0 full copies of its 100-token doc... the
    // prefix rule keeps nothing (cum 100 > 60) — allocation bounds are
    // never exceeded, even when granularity strands budget
    assert(out("dd") == (("dd", 1L, 100L, 200L, 60L, 0L, 0L)))
    // budget >= total capacity: every language caps at its capacity
    val capped = Sampling.unimax(rows, col("doc_id"), col("lang"),
        budgetNumer = 10L, budgetDenom = 1L, epochs = 2)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(capped.forall(r => r._5 == r._4 && r._7 == r._4))
    // zero budget keeps nothing
    val zero = Sampling.unimax(rows, col("doc_id"), col("lang"),
        budgetNumer = 0L, budgetDenom = 1L, epochs = 3)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(zero.forall(r => r._5 == 0L && r._6 == 0L))
    // multi-doc lang: epoch-major order means full first passes before
    // the partial second one — with alloc for exactly 1.5 epochs, every
    // doc appears at least once before any appears twice
    val multi = Seq.tabulate(6)(i =>
      (10L + i, "mm", ("t " * 10).trim)).toDF("doc_id", "lang", "text")
    val m = Sampling.unimax(multi, col("doc_id"), col("lang"),
        budgetNumer = 3L, budgetDenom = 2L, epochs = 2)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    // total 60, budget 90, capacity 120 -> share-limited to 90 = 9 docs
    assert(m == (("mm", 6L, 60L, 120L, 90L, 9L, 90L)))
    // corpus-frame determinism: same answer from a different partitioning
    val repart = Sampling.unimax(multi.repartition(7), col("doc_id"),
        col("lang"), budgetNumer = 3L, budgetDenom = 2L, epochs = 2)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(repart == m)
  }
}
