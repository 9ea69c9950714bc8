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
    zValueN(Seq(a, b), bits)
  }

  /** Morton-interleave N non-negative longs round-robin: bit `i` of
    * column `j` lands at position `i·N + j`, so equal-weight locality in
    * every dimension — real layout tuning wants 3-4 columns ("this user,
    * this week, this event class"), not 2. `N · bits` must stay within a
    * positive long (≤ 63); with more/wider dimensions, drop `bits`
    * (truncating to the TOP bits of a rank/bucket id keeps the coarse
    * locality that row-group pruning actually uses). */
  def zValueN(cols: Seq[Column], bits: Int = 21): Column = {
    val n = cols.size
    require(n >= 2, "zValueN needs at least 2 columns")
    require(bits >= 1 && n * bits <= 63,
      s"$n cols x $bits bits exceeds a positive long (n*bits must be <= 63)")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftright(c, i).bitwiseAND(1) * lit(1L << (i * n + j))
      }
    }.reduce(_ + _)
  }
}
