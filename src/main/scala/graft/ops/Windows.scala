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
}
