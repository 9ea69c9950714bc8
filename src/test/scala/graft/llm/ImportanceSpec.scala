package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hashed-feature scoring: DSIR log-ratio sign behavior and the exact
  * integer linear classifier. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("dsirLogRatio scores target-like docs above raw-like docs") {
    // target corpus speaks only "alpha beta"; raw marginal is dominated
    // by "zeta eta" — a raw doc that looks like the target must score
    // strictly higher than one that looks like the raw marginal
    val target = (1L to 20L).map(i => (i + 1000L, "alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val raw = ((1L to 20L).map(i => (i, "zeta eta zeta eta")) ++
      Seq((100L, "alpha beta alpha beta"), (101L, "zeta eta zeta eta")))
      .toDF("doc_id", "text")
    val scores = Importance.dsirLogRatio(raw, target, buckets = 64)
      .select("doc_id", "log_ratio").as[(Long, Double)].collect().toMap
    assert(scores(100L) > scores(101L),
      s"target-like ${scores(100L)} vs raw-like ${scores(101L)}")
    assert(scores(100L) > 0.0) // more likely under target than raw
    assert(scores(101L) < 0.0)
    // every raw doc scored exactly once
    assert(scores.size == raw.count())
  }

  test("dsirLogRatio is deterministic across runs") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    def run() = Importance.dsirLogRatio(docs, docs.limit(20), buckets = 256)
      .as[(Long, Long, Double)].collect().toSet
    assert(run() == run())
  }

  test("hashedLinearLogit matches a hand-computed fold and is exact") {
    // single doc, tiny bucket space: recompute the logit by replaying
    // the same hash → bucket → weight chain on the driver
    val doc = Seq((1L, "a b c")).toDF("doc_id", "text")
    val weights = Array.tabulate(8)(b => (b * 3 - 7).toLong)
    val grams = Seq("a", "b", "c", "a b", "b c")
    def bucket(g: String): Int =
      (graft.functions.Md5Prefix60.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"59:$g"))
        % 8L).toInt
    val expected = grams.map(g => weights(bucket(g))).sum
    val row = Importance.hashedLinearLogit(doc, weights,
        hasher = PortableSeededHash)
      .select("n_feats", "logit", "keep")
      .as[(Long, Long, Boolean)].head()
    assert(row._1 == grams.size)
    assert(row._2 == expected)
    assert(row._3 == (expected > 0))
  }

  test("hashedLinearLogit single-token doc has no bigrams") {
    val doc = Seq((1L, "solo")).toDF("doc_id", "text")
    val n = Importance.hashedLinearLogit(doc, Array.fill(8)(1L))
      .select("n_feats").as[Long].head()
    assert(n == 1L) // one unigram, zero bigrams — no slice underflow
  }

  test("trainLogisticHashed separates planted classes") {
    val train = ((1L to 30L).map(i => (i, "good clean prose here", 1)) ++
      (31L to 60L).map(i => (i, "spam junk noise words", 0)))
      .toDF("doc_id", "text", "label")
    val w = Importance.trainLogisticHashed(train, buckets = 64, iters = 3)
    val scored = Importance
      .hashedLinearLogit(train.drop("label"), w)
      .select("doc_id", "logit").as[(Long, Long)].collect().toMap
    assert((1L to 30L).forall(scored(_) > 0), "positive class")
    assert((31L to 60L).forall(scored(_) < 0), "negative class")
  }

  test("training is invariant to partitioning (quantized-state claim)") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .withColumn("label", (col("doc_id") % 2 === 0).cast("int"))
    def w(parts: Int) = Importance.trainLogisticHashed(
      docs.repartition(parts), buckets = 128, iters = 2).toSeq
    assert(w(1) == w(7)) // exact integer gradients: merge order is moot
  }

  test("compiled margin fold trains the identical model to the HOF " +
    "spelling") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .withColumn("label", (col("doc_id") % 2 === 0).cast("int"))
    val k = Importance.trainLogisticHashed(docs, buckets = 128, iters = 3,
      kernel = true).toSeq
    val h = Importance.trainLogisticHashed(docs, buckets = 128, iters = 3,
      kernel = false).toSeq
    assert(k == h) // every iteration's margins are exact integers: one
                   // differing fold anywhere diverges the whole model
  }

  test("compiled logit kernel == HOF spelling, both hash families") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .limit(200)
    val w = Array.tabulate(128)(i => (i * 37 % 101) - 50L)
    for (hasher <- Seq(XxSeededHash, PortableSeededHash)) {
      val k = docs.select(col("doc_id"),
          Importance.logitCol(col("text"), w, 59, hasher).as("l"))
        .as[(Long, Long)].collect().toMap
      val h = docs.select(col("doc_id"),
          Importance.logitCol(col("text"), w, 59, hasher, kernel = false)
            .as("l"))
        .as[(Long, Long)].collect().toMap
      assert(k == h, hasher.name)
    }
  }

  test("roundHalfAway matches SQL ROUND on negative halves") {
    assert(Importance.roundHalfAway(2.5) == 3L)
    assert(Importance.roundHalfAway(-2.5) == -3L) // math.round gives -2
    assert(Importance.roundHalfAway(2.4) == 2L)
    assert(Importance.roundHalfAway(-2.4) == -2L)
  }

  private def report(rows: Seq[(Long, Long)], width: Long = 1L << 20) =
    Importance.aucReport(rows.toDF("y", "logit"), bucketWidth = width)
      .collect().head

  test("aucReport: perfect, inverted, and chance classifiers") {
    val perfect = report(Seq((1L, 10L), (1L, 9L), (0L, -1L), (0L, -2L)))
    assert(perfect.getAs[Double]("auc") == 1.0)
    assert(perfect.getAs[Long]("n_tp") == 2 &&
      perfect.getAs[Long]("n_tn") == 2 &&
      perfect.getAs[Double]("f1") == 1.0)
    val inverted = report(Seq((0L, 10L), (0L, 9L), (1L, -1L), (1L, -2L)))
    assert(inverted.getAs[Double]("auc") == 0.0)
    // all scores tied: average-rank AUC is exactly 1/2
    val chance = report(Seq((1L, 5L), (0L, 5L), (1L, 5L), (0L, 5L)))
    assert(chance.getAs[Double]("auc") == 0.5)
  }

  test("aucReport matches a hand-computed tied example") {
    // scores: pos {3, 2, 2}, neg {2, 1}; sorted ranks: 1→1, the three
    // 2s share avgrank 3, 3→5. U = Σ_pos rank − nPos(nPos+1)/2
    //   = (5 + 3 + 3) − 6 = 5; AUC = 5 / (3·2) = 0.8333
    val r = report(Seq((1L, 3L), (1L, 2L), (1L, 2L), (0L, 2L), (0L, 1L)))
    assert(r.getAs[Double]("auc") == 0.8333)
    // threshold 0: every score > 0 → tp=3 fp=2 fn=0 tn=0
    assert(r.getAs[Long]("n_tp") == 3 && r.getAs[Long]("n_fp") == 2)
    assert(r.getAs[Double]("prec") == 0.6 && r.getAs[Double]("rec") == 1.0)
    assert(r.getAs[Double]("f1") == 0.75)
  }

  test("aucReport is bucket-width independent (two-phase prefix law)") {
    // scores spanning many buckets at width 2: cross-bucket cumulative
    // must agree with the single-bucket global window
    val rows = (1L to 40L).map(i => ((i % 3 == 0).compare(false).toLong,
      (i * 7) % 23 - 11))
    val wide = report(rows, width = 1L << 40)
    val narrow = report(rows, width = 2L)
    assert(wide == narrow)
  }

  test("classifierCalibration: bins partition the held-out set and " +
      "mean p̂ stays inside each bin's range") {
    val rep = graft.queries.LlmQueries
      .classifierCalibration(spark, Sf0001)
      .as[(Long, Long, Double, Double)].collect().toList
    assert(rep.map(_._1) == rep.map(_._1).sorted) // ordered bins
    // the held-out split is 20% of the hash space
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val held = docs.where(
      PortableSeededHash.hash(col("doc_id"), 42) % 100 >= 80).count()
    assert(rep.map(_._2).sum == held)
    rep.foreach { case (bin, n, phat, obs) =>
      assert(n > 0 && bin >= 0 && bin <= 8)
      val lo = bin * 131072.0 / 1048576.0
      val hi = (bin + 1) * 131072.0 / 1048576.0
      assert(phat >= lo - 5e-5 && phat <= hi + 5e-5, s"bin $bin p̂ $phat")
      assert(obs >= 0.0 && obs <= 1.0)
    }
  }

  test("dsirResample: Gumbel top-k keys recompute driver-side; " +
      "selection is deterministic and importance-biased") {
    val out = graft.queries.LlmQueries.dsirResample(spark, Sf0001)
      .as[(Long, Long, Double, Double, Long)].collect().toList
    assert(out.map(_._5) == (1L to 64L).toList) // dense ranks
    // key law: round4(log_ratio − ln(−ln((h+0.5)/2^60)))
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    out.foreach { case (id, _, lr, key, _) =>
      val u = (h60(s"67:$id").toDouble + 0.5) / math.pow(2, 60)
      val expect = BigDecimal(lr + -math.log(-math.log(u)))
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(key == expect, s"doc $id")
    }
    // importance bias: the resampled mean log-ratio beats the corpus mean
    val all = graft.queries.LlmQueries.dsirScore(spark, Sf0001)
      .select("log_ratio").as[Double].collect()
    val corpusMean = all.sum / all.length
    val selMean = out.map(_._3).sum / out.size
    assert(selMean > corpusMean,
      s"selected $selMean vs corpus $corpusMean")
  }

  test("driftPsi: bins partition the corpus and contributions are " +
      "nonnegative (sign law of (p−q)·ln(p/q))") {
    val rep = graft.queries.LlmQueries.driftPsi(spark, Sf0001)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toList
    assert(rep.map(_._1) == rep.map(_._1).sorted)
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    assert(rep.map(r => r._2 + r._3).sum == docs.count())
    rep.foreach { case (bin, cr, cc, p, q, psi) =>
      assert(psi >= 0.0, s"bin $bin") // ln is monotone ⇒ same sign
      assert(p > 0.0 && q > 0.0)     // add-one smoothing kills zeros
      assert(cr >= 0 && cc >= 0)
    }
    // identical distributions within the split ⇒ low PSI overall
    assert(rep.map(_._6).sum / 10000.0 < 0.25)
  }

  test("aucReport: degenerate all-negative threshold side is null-safe") {
    val r = report(Seq((1L, -5L), (1L, -3L), (0L, -4L)))
    assert(r.isNullAt(r.fieldIndex("prec"))) // tp+fp = 0
    assert(r.getAs[Double]("rec") == 0.0)
    assert(r.getAs[Double]("f1") == 0.0)
  }
}
