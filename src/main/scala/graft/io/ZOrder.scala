package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting a table by `zValue2(a, b)` before writing clusters rows that
  * are close in BOTH dimensions into the same parquet row groups, so the
  * footer min/max statistics prune scans for predicates on EITHER column
  * — the standard layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) for
  * the 100 TB "filter by user AND by time" access pattern, where a plain
  * sort only prunes its leading column.
  *
  * Pure `Column` arithmetic (shift/mask/multiply — fully codegen'd, no
  * UDF): each input is clamped to `bits` low bits (21 each keeps the
  * interleave inside a positive long) and spread to even/odd bit
  * positions. Inputs must be non-negative after any caller-side
  * normalization (rank/bucket ids, day numbers, dictionary codes).
  */
object ZOrder {

  /** Morton-interleave two non-negative longs (low `bits` bits each). */
  def zValue2(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(1) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(1) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }
}
