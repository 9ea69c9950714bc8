package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the "ANALYZE"/data-quality summary every
  * ingestion pipeline runs before training filters are tuned: per column,
  * row count, null count, exact distinct count, min and max (rendered as
  * strings so heterogeneous column types share one result schema).
  *
  * ONE aggregation over the input computes every column's stats
  * simultaneously — the multi-distinct Expand path (one `count(DISTINCT
  * c)` per column, q64's machinery) — then a generator unpivots the
  * single stats row into one row per column. The input is scanned once
  * regardless of how many columns are profiled; only the ~columns-wide
  * stats row ever shuffles.
  *
  * Plan note: min/max over STRING columns have immutable aggregation
  * buffers, so Spark plans SortAggregate (not HashAggregate) — partial
  * aggregation still applies, but each partition sorts its expanded rows.
  * At extreme scale, drop string min/max (or truncate to a fixed-width
  * prefix) to get the hash path back.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"), col(s"_max_$c").as("max_value"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_null"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
  }
}
