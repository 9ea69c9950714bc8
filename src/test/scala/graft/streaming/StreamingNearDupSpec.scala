package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The online LSH near-dup detector's contract (see StreamingNearDup
  * scaladoc): in-batch flags are row-order independent; a later
  * micro-batch's near-dup of an earlier doc is flagged; an out-of-order
  * pair (larger id strictly earlier) degrades to a miss, never a false
  * flag. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog again"
  private val textB = "completely different content about spark query plans"
  private val textC = "unrelated third document mentioning neither foxes nor dogs"

  private def play(batches: Seq[Seq[(Long, String)]]): Map[Long, Long] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val name = s"t_neardup_${System.nanoTime()}"
    val q = StreamingNearDup.detect(spark, mem.toDF().toDF("doc_id", "text"))
      .toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
      .groupBy("doc_id")
      .agg(sum(when(col("dup"), 1L).otherwise(0L)).as("n"))
      .as[(Long, Long)].collect().toMap
  }

  test("single batch: identical docs -> all bands flagged on the larger id") {
    val out = play(Seq(Seq(10L -> textA, 11L -> textB, 12L -> textA)))
    assert(out(10L) == 0L) // the keeper
    assert(out(12L) == 4L) // identical signature: all 4 bands hit
    assert(out(11L) == 0L) // unrelated
  }

  test("cross-batch state: a later-batch duplicate is flagged") {
    val out = play(Seq(
      Seq(10L -> textA, 11L -> textB),
      Seq(12L -> textA, 13L -> textC)))
    assert(out(10L) == 0L && out(12L) == 4L)
    assert(out(11L) == 0L && out(13L) == 0L)
  }

  test("out-of-order pair degrades to a miss, never a false flag") {
    // the LARGER id arrives a batch before the smaller: 12 was emitted
    // un-flagged (append mode cannot retract) and 10 becomes the keeper
    // — nothing is ever falsely flagged
    val out = play(Seq(Seq(12L -> textA), Seq(10L -> textA)))
    assert(out(12L) == 0L)
    assert(out(10L) == 0L)
  }

  test("ShingleMinHash == the HOF formulation, both hash families") {
    import graft.llm.{PortableSeededHash, TextAnalysis, XxSeededHash}
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq(9001L -> "one two", 9002L -> "exactly three tokens",
        9003L -> "é中文 unicode token bytes here")
        .toDF("doc_id", "text"))
    for (hasher <- Seq(PortableSeededHash, XxSeededHash)) {
      val native = docs.select(col("doc_id"),
          org.apache.spark.sql.graft.ColumnBridge.column(
            graft.functions.ShingleMinHash(
              org.apache.spark.sql.graft.ColumnBridge.expression(
                TextAnalysis.tokens(col("text"))), 3, 16,
              hasher eq PortableSeededHash)).as("mhs"))
        .where(col("mhs").isNotNull)
        .as[(Long, Seq[Long])].collect().toMap
      val hof = StreamingNearDup.sigHof(docs, 3, 16, hasher)
        .as[(Long, Seq[Long])].collect().toMap
      assert(native.keySet == hof.keySet, hasher.name) // 9001 dropped: < 3 tokens
      assert(!native.contains(9001L))
      native.foreach { case (id, a) => assert(a == hof(id), s"${hasher.name} doc $id") }
    }
  }

  test("ShingleMinHash: null tokens follow concat_ws null-skip semantics") {
    // split() never yields null tokens, but hand-built token arrays can;
    // the compiled pass must join windows the way concat_ws does — null
    // tokens contribute neither bytes nor a separator, and an empty
    // STRING token is still a joined value
    import graft.llm.{Dedup, PortableSeededHash, TextAnalysis, XxSeededHash}
    val toks = array(lit("a"), lit(null).cast("string"), lit("b"),
      lit(""), lit("c"), lit(null).cast("string"))
    val base = Seq(Tuple1(1L)).toDF("doc_id").select(col("doc_id"), toks.as("toks"))
    val k = 8
    for (hasher <- Seq(PortableSeededHash, XxSeededHash)) {
      val native = base.select(
          org.apache.spark.sql.graft.ColumnBridge.column(
            graft.functions.ShingleMinHash(
              org.apache.spark.sql.graft.ColumnBridge.expression(col("toks")),
              3, k, hasher eq PortableSeededHash)).as("mhs"))
        .as[Seq[Long]].head()
      // the HOF twin (sigHof's formulation, inlined over the token array)
      val hb = transform(
        TextAnalysis.distinctShinglesFromTokens(col("toks"), 3),
        s => pmod(hasher.hash(s, 0), lit(Dedup.P31)))
      val hof = base.select(col("doc_id"), hb.as("hb"))
        .select(array((0 until k).map { i =>
          array_min(transform(col("hb"),
            x => (x * (2 * i + 1) + Dedup.bSeed(i)) % Dedup.P31))
        }: _*).as("mhs"))
        .as[Seq[Long]].head()
      assert(native == hof, hasher.name)
    }
  }

  test("stateTtl: a TTL above the replay duration changes nothing") {
    // streaming, 1h TTL, sub-second replay: no bucket is idle long enough
    // to evict, so the output is identical to the NoTimeout detector —
    // the TTL bounds state on a LONG-RUNNING ingest without touching the
    // semantics of an active stream. (Eviction itself is wall-clock
    // behavior; its contract — miss, never false flag — is the same
    // degradation as the out-of-order case above.)
    //
    // NOTE the sink is POLLED, not processAllAvailable'd: with
    // ProcessingTimeTimeout armed, FlatMapGroupsWithStateExec requests
    // another batch after EVERY batch (the engine must keep waking to
    // evaluate timeouts), so `noNewData` never latches and
    // processAllAvailable blocks forever — the documented caller
    // contract on `detect`.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val name = s"t_ttl_${System.nanoTime()}"
    val q = StreamingNearDup.detect(spark, mem.toDF().toDF("doc_id", "text"),
        stateTtl = Some(java.time.Duration.ofHours(1)))
      .toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(10L -> textA, 11L -> textB)
      mem.addData(12L -> textA, 13L -> textC)
      // 4 docs × 4 bands = 16 BandHit rows once every batch has committed
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (spark.table(name).count() < 16) {
        q.exception.foreach(throw _)
        assert(System.nanoTime() < deadline, "timed out waiting for 16 rows")
        Thread.sleep(100)
      }
    } finally q.stop()
    val out = spark.table(name).groupBy("doc_id")
      .agg(sum(when(col("dup"), 1L).otherwise(0L)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 0L, 11L -> 0L, 12L -> 4L, 13L -> 0L))
    // batch mode ignores processing-time timeouts entirely: TTL-on equals
    // TTL-off row for row
    val docs = Seq(10L -> textA, 11L -> textB, 12L -> textA)
      .toDF("doc_id", "text")
    def batch(ttl: Option[java.time.Duration]) =
      StreamingNearDup.detect(spark, docs, stateTtl = ttl)
        .collect().toSet
    assert(batch(Some(java.time.Duration.ofMillis(1))) == batch(None))
  }

  test("batch-mode execution matches the relational restatement") {
    // flatMapGroupsWithState in batch mode: one group pass, empty state —
    // min-keeper outcome identical to the oracle's formulation
    val docs = Seq(10L -> textA, 11L -> textB, 12L -> textA, 13L -> textC)
      .toDF("doc_id", "text")
    val out = StreamingNearDup.detect(spark, docs).toDF()
      .groupBy("doc_id")
      .agg(sum(when(col("dup"), 1L).otherwise(0L)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 0L, 11L -> 0L, 12L -> 4L, 13L -> 0L))
  }
}
