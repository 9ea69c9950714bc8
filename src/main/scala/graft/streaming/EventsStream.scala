package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events stream (SURVEY.md §2.9 —
  * the reference is batch-only; its daily submissionDate loop is the manual
  * ancestor of this). Batch and stream share the same Column pipeline: every
  * transform here is also applied in batch mode by the q40-q42 queries, so
  * correctness is oracle-checked in batch and replay-checked in streaming
  * tests.
  *
  * Scale: file-source streaming reads incrementally (maxFilesPerTrigger);
  * watermarks bound state; session windows / dedup state live in the state
  * store keyed by (user, window) — partitioned by key, no driver state.
  */
object EventsStream {

  /** Replay a parquet events directory as a stream (file source requires an
    * explicit schema). */
  def fromDirectory(spark: SparkSession, path: String,
                    maxFilesPerTrigger: Int = 1): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
  }

  /** Tumbling 1-hour counts per event type with a 2-hour watermark.
    * Works identically on batch and streaming frames. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based session windows (30 min) per user. `watermark = None` keeps
    * all session state (only sane for bounded replays / batch; production
    * streams need the watermark so closed sessions leave the state
    * store). */
  def sessionWindows(events: DataFrame,
                     watermark: Option[String] = Some("2 hours")): DataFrame =
    watermark.fold(events)(events.withWatermark("ts", _))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"))

  /** Streaming dedup on event_id within the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream self-join: pair each purchase with the same user's
    * signups within the preceding hour. Both sides carry watermarks and
    * the join condition bounds event time on both ends, so state is
    * evictable — the canonical interval-join shape. */
  def purchaseAfterSignup(events: DataFrame): DataFrame = {
    val signups = events.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "2 hours")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.as("p").join(signups.as("s"),
      expr("""p.user_id = s.user_id AND
              purchase_ts >= signup_ts AND
              purchase_ts <= signup_ts + INTERVAL 1 HOUR"""))
      .select(col("p.user_id").as("user_id"), col("signup_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  // ---- custom state: running per-user counters via mapGroupsWithState ----

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserCounter(user_id: Long, n_events: Long, sum_value: Double)

  /** Arbitrary stateful aggregation — the streaming analog of the
    * reference's Counter-monoid keyed state (profile_daily.py:142-197):
    * per-user running totals held in the state store. */
  def runningUserCounters(spark: SparkSession, events: DataFrame): Dataset[UserCounter] = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserCounter, UserCounter](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserCounter]) =>
          val prev = state.getOption.getOrElse(UserCounter(uid, 0L, 0.0))
          val merged = rows.foldLeft(prev) { (acc, e) =>
            UserCounter(uid, acc.n_events + 1, acc.sum_value + e.value)
          }
          state.update(merged)
          merged
      }
  }
}
