package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge — the versioned companion to
  * [[Merge.upsert]] (which is Type-1: overwrite in place). A delta row
  * whose attributes differ from the key's CURRENT version closes that
  * version (`valid_to` = the delta's effective date) and opens a new
  * current one; an unchanged delta is a no-op; an unmatched delta key
  * inserts its first version; history rows pass through untouched.
  *
  * Shape: one full-outer co-shuffle of the current slice against the
  * delta on the key (history never joins — it unions through), then
  * column-wise null-safe comparison decides close/keep/open. Same single
  * co-shuffle a warehouse MERGE plans; at 100 TB partition the snapshot
  * by `valid_to IS NULL` so the current slice — the only joined part —
  * stays a small fraction of the full history.
  */
object Scd {

  /** `base`: keys ++ attrs ++ (valid_from, valid_to — null = current).
    * `delta`: keys ++ attrs ++ `effectiveDate` (the closing/opening
    * stamp; any orderable, comparable-for-equality type works for attrs).
    * Assumes at most one current version per key and one delta row per
    * key (pre-aggregate the delta to "latest per key" first). */
  def applyType2(base: DataFrame, delta: DataFrame, keys: Seq[String],
                 attrs: Seq[String], effectiveDate: String): DataFrame = {
    val cur = base.where(col("valid_to").isNull)
    val hist = base.where(col("valid_to").isNotNull)
    val d = delta.select((keys ++ attrs).map(col) :+
      col(effectiveDate).as("_eff"): _*)
    val j = cur.as("c").join(d.as("d"), keys, "full_outer")
    val inCur = col("c.valid_from").isNotNull
    val inDelta = col("_eff").isNotNull
    val changed = attrs.map(a => !(col(s"c.$a") <=> col(s"d.$a")))
      .reduce(_ || _)
    val outCols = keys.map(col) ++ attrs.map(c => col(c)) ++
      Seq(col("valid_from"), col("valid_to"))

    // current versions that survive as-is (no delta, or unchanged delta)
    val kept = j.where(inCur && (!inDelta || !changed))
      .select(keys.map(col) ++ attrs.map(a => col(s"c.$a").as(a)) ++
        Seq(col("c.valid_from").as("valid_from"),
          col("c.valid_to").as("valid_to")): _*)
    // current versions closed by a changed delta
    val closedOut = j.where(inCur && inDelta && changed)
      .select(keys.map(col) ++ attrs.map(a => col(s"c.$a").as(a)) ++
        Seq(col("c.valid_from").as("valid_from"),
          col("_eff").as("valid_to")): _*)
    // newly-opened versions (changed, or first sighting of the key)
    val opened = j.where(inDelta && (!inCur || changed))
      .select(keys.map(col) ++ attrs.map(a => col(s"d.$a").as(a)) ++
        Seq(col("_eff").as("valid_from"),
          lit(null).cast(base.schema("valid_to").dataType)
            .as("valid_to")): _*)

    hist.select(outCols: _*)
      .unionByName(kept).unionByName(closedOut).unionByName(opened)
  }
}
