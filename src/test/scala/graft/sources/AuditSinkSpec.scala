package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Tables

class AuditSinkSpec extends SparkSpec {

  test("streaming commit is epoch-idempotent: a replayed epoch is skipped") {
    AuditSink.clear("t_epoch")
    AuditSink.accumulateEpoch("t_epoch", 0L, 10L, 7L)
    AuditSink.accumulateEpoch("t_epoch", 1L, 5L, 3L)
    // failure between sink commit and offset-log commit => epoch 1 replays
    AuditSink.accumulateEpoch("t_epoch", 1L, 5L, 3L)
    assert(AuditSink.result("t_epoch").contains((15L, 10L)))
    AuditSink.accumulateEpoch("t_epoch", 2L, 1L, 1L)
    assert(AuditSink.result("t_epoch").contains((16L, 11L)))
  }

  test("batch write: commit aggregation counts every row exactly once") {
    AuditSink.clear("t_batch")
    val df = Tables.table(spark, Sf0001, "customer").repartition(4)
    df.write.format("graft.sources.AuditSink")
      .mode("append").option("name", "t_batch").save()
    val (rows, checksum) = AuditSink.result("t_batch").get
    assert(rows == 150L)
    assert(checksum > 0L)
    // idempotence of the protocol, not the sink: a second job adds again
    df.write.format("graft.sources.AuditSink")
      .mode("append").option("name", "t_batch").save()
    assert(AuditSink.result("t_batch").get._1 == 300L)
  }

  test("streaming write: epochs accumulate to the full input") {
    AuditSink.clear("t_stream")
    val dir = java.nio.file.Files.createTempDirectory("graft-audit").toString
    Tables.table(spark, Sf0001, "events")
      .repartitionByRange(4, col("ts")).write.mode("overwrite").parquet(dir)
    val stream = graft.streaming.EventsStream.fromDirectory(spark, dir)
    val q = stream.writeStream.format("graft.sources.AuditSink")
      .option("name", "t_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    assert(AuditSink.result("t_stream").get._1 == 1000L)
  }
}
