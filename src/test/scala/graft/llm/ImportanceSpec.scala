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
}
