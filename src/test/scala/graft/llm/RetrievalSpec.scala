package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def queriesDf(rows: (Long, Seq[String])*): DataFrame =
    rows.toDF("query_id", "qterms")

  test("bm25 hand-computed score on a two-doc corpus") {
    // corpus: d1 = "a b a", d2 = "b c"; query = [a]
    // N=2, sum_dl=5, avgdl=2.5; df(a)=1
    // idf(a) = ln(1 + (2-1+0.5)/(1+0.5)) = ln 2
    // d1: tf=2, dl=3 -> contrib = ln2 * (2*2.2) / (2 + 1.2*(0.25+0.75*3*2/5))
    val docs = docsDf(1L -> "a b a", 2L -> "b c")
    val qs = queriesDf(10L -> Seq("a"))
    val out = Retrieval.bm25TopK(docs, qs, k = 5)
      .select("query_id", "rk", "doc_id", "hits", "score")
      .as[(Long, Long, Long, Long, Double)].collect().toList
    val idf = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5))
    val denom = 2 + 1.2 * (0.25 + 0.75 * 3 * 2 / 5.0)
    val cFp = java.math.BigDecimal.valueOf(idf * (2 * 2.2) / denom * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val expected = java.math.BigDecimal.valueOf(cFp / 1e6)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(out == List((10L, 1L, 1L, 1L, expected)))
  }

  test("bm25 ranks the term-bearing doc first and respects tf saturation") {
    val docs = docsDf(
      1L -> "x x x x x x x x filler filler",
      2L -> "x filler filler filler filler",
      3L -> "filler junk junk junk")
    val qs = queriesDf(7L -> Seq("x"))
    val got = Retrieval.bm25TopK(docs, qs, k = 5)
      .orderBy("rk").select("doc_id").as[Long].collect().toList
    // only docs containing x are retrieved; higher-tf doc ranks first
    assert(got == List(1L, 2L))
  }

  test("bm25 multi-term query sums contributions and counts hits") {
    val docs = docsDf(1L -> "a b", 2L -> "a c", 3L -> "c d")
    val qs = queriesDf(1L -> Seq("a", "b"))
    val got = Retrieval.bm25TopK(docs, qs, k = 5)
      .select("doc_id", "hits").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("bm25 idf downweights common terms: rare-term doc outranks " +
    "common-term doc at equal tf and dl") {
    // "rare" appears in 1 of 4 docs, "common" in all 4; d1/d2 identical
    // lengths and tf — only idf separates them
    val docs = docsDf(
      1L -> "rare pad pad",
      2L -> "common pad pad",
      3L -> "common other filler",
      4L -> "common more words")
    val qs = queriesDf(1L -> Seq("rare", "common"))
    val byDoc = Retrieval.bm25TopK(docs, qs, k = 5)
      .select("doc_id", "rk").as[(Long, Long)].collect().toMap
    assert(byDoc(1L) < byDoc(2L))
  }

  test("persisted index roundtrip: indexed search == in-query search") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val queries = docs.orderBy("doc_id").limit(6)
      .select(col("doc_id").as("query_id"),
        org.apache.spark.sql.functions.slice(
          TextAnalysis.tokens(col("text")), 1, 5).as("qterms"))
    val direct = Retrieval.bm25TopK(docs, queries, k = 5)
      .collect().map(_.toSeq).toSet
    Retrieval.writeBm25Index(docs, "graft_bm25_spec")
    val indexed = Retrieval
      .bm25SearchIndexed(spark, queries, "graft_bm25_spec", k = 5)
      .collect().map(_.toSeq).toSet
    assert(indexed == direct)
  }

  test("bm25 duplicate query terms do not double-count") {
    val docs = docsDf(1L -> "a b c")
    val once = Retrieval.bm25TopK(docs, queriesDf(1L -> Seq("a")), 5)
      .select("score").as[Double].collect().head
    val twice = Retrieval.bm25TopK(docs, queriesDf(1L -> Seq("a", "a")), 5)
      .select("score").as[Double].collect().head
    assert(once == twice)
  }

  test("hybrid RRF fusion: scores are the exact integer rank formula") {
    val out = graft.queries.LlmQueries.hybridRetrieval(spark, Sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    assert(out.size == 20) // 4 queries × top-5
    // rk dense 1..5 per query, output ordered
    assert(out.groupBy(_._1).forall(_._2.map(_._2) == Seq(1L, 2L, 3L, 4L, 5L)))
    // every fused score is Σ_legs 10⁹ div (60 + rank), rank 0 = missed
    out.foreach { case (_, _, _, rrf, bm, dn) =>
      val expect = (if (bm > 0) 1000000000L / (60 + bm) else 0L) +
        (if (dn > 0) 1000000000L / (60 + dn) else 0L)
      assert(rrf == expect, s"rrf $rrf vs $expect (bm=$bm dn=$dn)")
      assert(bm > 0 || dn > 0) // a fused candidate came from some leg
    }
    // monotone: fused list is sorted by score desc within each query
    out.groupBy(_._1).values.foreach { g =>
      val scores = g.sortBy(_._2).map(_._4)
      assert(scores == scores.sorted(Ordering[Long].reverse))
    }
    // both legs contribute somewhere (the ensemble is real, not one leg)
    assert(out.exists(r => r._5 > 0 && r._6 == 0))
    assert(out.exists(r => r._6 > 0 && r._5 == 0))
  }
}
