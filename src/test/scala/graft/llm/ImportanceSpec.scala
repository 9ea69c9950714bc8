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
}
