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
