package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / sessionization windows (SURVEY.md §2.5 W1/O1 — the reference
  * has no window functions; its per-key `limit=1000` HBase bound and
  * `most_common()` sort are the nearest analogs).
  *
  * Scale note: a window partitioned by a high-cardinality key shuffles once
  * on that key and sorts within partitions — same cost shape as a groupBy.
  * Never use a global (unpartitioned) window at scale.
  */
object Windows {
  /** Per-key top-k with a total (deterministic) ordering — callers must
    * include a unique tie-breaker in `orderBy`. */
  def topKPerKey(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
                 k: Int, rankName: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn(rankName, row_number().over(w)).where(col(rankName) <= k)
  }

  /** Batch sessionization: assign session ids per key from gaps > `gapSec`
    * seconds between consecutive events. Equivalent to Structured
    * Streaming's `session_window` in batch form (gap-merged sessions). */
  def sessionize(df: DataFrame, keyCol: Column, tsCol: Column,
                 tieBreak: Column, gapSec: Double,
                 sessionName: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieBreak)
    val gap = tsCol.cast("double") - lag(tsCol, 1).over(w).cast("double")
    val isNew = when(gap.isNull || gap > gapSec, 1L).otherwise(0L)
    df.withColumn(sessionName,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Time-series RESAMPLE + FORWARD FILL (q162): densify each key's
    * event stream onto an hourly grid — every hour between the key's
    * first and last active hour gets a row — carrying the last observed
    * value across gap hours (`last(ignoreNulls)` over the grid) and a
    * per-hour event count (0 on gap hours). The standard time-series
    * preparation step (metric dashboards, feature windows, training
    * sequences over sparse event logs).
    *
    * Per-hour value = the value of the MAX `order` event in that hour
    * (`max_by`) — `order` must be unique (an event id) so the
    * resampled value is deterministic under ties on the timestamp.
    *
    * Scale shape: one (key, hour) partial-aggregated shuffle over the
    * events (the only corpus-sized term), a per-key bounds aggregate on
    * the already-hourly frame, `sequence`-explode of the grid — sized
    * by keys × time-span, the DENSIFIED dimension, independent of event
    * count — and one ranged window per key for the fill. Nothing
    * quadratic, no driver-side time loop. */
  def resampleFfillHourly(df: DataFrame, key: Column, ts: Column,
                          order: Column, value: Column): DataFrame = {
    val hourly = df
      .groupBy(key.as("key"), date_trunc("hour", ts).as("bucket"))
      .agg(max_by(value, order).as("v"), count(lit(1)).as("n_events"))
    // Expand each event-hour's RUN (up to the next event hour) directly,
    // instead of densifying a per-key [lo, hi] grid and left-joining the
    // hourly frame back onto it: the grid spelling costs a bounds
    // aggregation, a second explode of the same cells, and a
    // (key, bucket) sort-merge join of the LARGEST frame in the query —
    // the run spelling is one window pass over the hourly frame (the
    // ffill value and the run end are two expressions over the same
    // (key, bucket) sort) and one explode. Same rows: every grid cell
    // lies in exactly one run [bucket, next−1h] (the last run is the
    // single cell [hi, hi]), the carried `value_ffill` is the
    // last-non-null-at-or-before value exactly as the joined window
    // computed it, and gap cells get n_events = 0 from the run expansion
    // rather than from the null side of the join.
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
    val runs = hourly.select(col("key"), col("bucket").as("b0"),
      last(col("v"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("value_ffill"),
      col("n_events"),
      lead(col("bucket"), 1).over(w).as("nxt"))
    runs
      .select(col("key"), col("b0"), col("value_ffill"), col("n_events"),
        explode(sequence(col("b0"),
          coalesce(col("nxt") - expr("INTERVAL 1 HOUR"), col("b0")),
          expr("INTERVAL 1 HOUR"))).as("bucket"))
      .select(col("key"), col("bucket"), col("value_ffill"),
        when(col("bucket") === col("b0"), col("n_events")).otherwise(lit(0L))
          .as("n_events"))
  }
}
