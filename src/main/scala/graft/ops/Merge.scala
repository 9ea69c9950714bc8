package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot upsert — MERGE-INTO semantics over plain parquet frames (the
  * daily-pipeline staple: yesterday's snapshot + today's delta → new
  * snapshot). The reference re-runs its daily job as a blind partition
  * overwrite (testpilot_data.py's save path); upsert is the general form
  * when the delta touches arbitrary keys.
  *
  * WHEN MATCHED the update row wins column-wise (a NULL update column
  * keeps the base value — deltas may carry partial rows); WHEN NOT
  * MATCHED the update row inserts; base rows without a delta survive
  * unchanged. One full-outer shuffle on the key — no driver-side state,
  * no row-at-a-time merge; at 100 TB this is the same single co-shuffle
  * a MERGE INTO executes, and pairing it with partition pruning on the
  * snapshot (only touched partitions join) is the standard incremental
  * layout.
  */
object Merge {

  /** Column-wise upsert of `updates` into `base` (same schema, keyed by
    * `keys`). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(base.columns.toSeq == updates.columns.toSeq,
      "upsert expects identical schemas")
    val payload = base.columns.filterNot(keys.contains)
    base.as("b").join(updates.as("u"), keys, "full_outer")
      .select(keys.map(col) ++ payload.map(c =>
        coalesce(col(s"u.$c"), col(s"b.$c")).as(c)): _*)
  }
}
