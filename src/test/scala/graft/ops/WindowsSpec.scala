package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Laws of the time-series resample + forward fill. */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleFfillHourly: dense grid, gap hours ffilled with 0 events, " +
    "ties resolved by the order column") {
    val ev = Seq(
      // user 1: hours 10, 11, 14 active — 12 and 13 are gaps
      (1L, 1L, ts("2024-01-01 10:05:00"), 10.0),
      (2L, 1L, ts("2024-01-01 11:10:00"), 20.0),
      // same hour + same timestamp: max event_id (4) wins
      (3L, 1L, ts("2024-01-01 14:00:30"), 30.0),
      (4L, 1L, ts("2024-01-01 14:00:30"), 40.0),
      // user 2: a single active hour -> single-row grid
      (5L, 2L, ts("2024-01-02 00:59:59"), 7.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Windows.resampleFfillHourly(ev,
        col("user_id"), col("ts"), col("event_id"), col("value"))
      .orderBy("key", "bucket")
      .select(col("key"), date_format(col("bucket"), "HH").cast("int"),
        col("value_ffill"), col("n_events"))
      .as[(Long, Int, Double, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 10, 10.0, 1L),
      (1L, 11, 20.0, 1L),
      (1L, 12, 20.0, 0L),   // gap hour: carried value, zero events
      (1L, 13, 20.0, 0L),
      (1L, 14, 40.0, 2L),   // tie on ts: event_id 4's value
      (2L, 0, 7.0, 1L)))
  }
}
