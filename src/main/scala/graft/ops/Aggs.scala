package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Aggregation builders for the reference's keyed-monoid surface
  * (SURVEY.md §2.4 A1-A6). Everything here compiles to partial+final
  * HashAggregate with map-side combine — the property the reference got by
  * hand-picking `reduceByKey` over `groupByKey`
  * (/root/reference/cliqz_etl/profile_daily.py:54-55) is automatic.
  */
object Aggs {
  /** A4: conditional count (`sum(int(event == X))`,
    * profile_daily.py:176-197). */
  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** A3 (map half): per-group key OCCURRENCES as a sorted comma-joined
    * string (repeats preserved — "a,a,b" for Counter(a→2, b→1)). A
    * byte-stable group summary (map iteration order is not); the rendered
    * `k:v` count-map form lives in q17
    * ([[graft.queries.RelationalQueries.typeCountMap]], oracle-gated). */
  def sortedCountMap(key: Column): Column =
    array_join(array_sort(collect_list(key)), ",")

  /** A5/A6: deterministic mode — most frequent `value` per group, ties
    * broken by smallest value (the reference's `most_common()[0][0]` is
    * tie-unstable, profile_daily.py:232; SURVEY.md §3.1). Implemented as
    * count-then-argmax: max_by over (count, reversed value) needs an
    * orderable tuple, so we rank instead — see Windows.topK for the
    * windowed variant. Here: two-level aggregation. */
  def modePerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   countName: String = "cnt"): DataFrame = {
    val counted = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as(countName))
    // argmax by (cnt desc, value asc): max_by on a struct orders
    // lexicographically; negate impossible for strings, so rank via struct
    // (cnt, reverse(value)) is fragile — use min_by over (-cnt, value).
    counted.groupBy(groupCols.map(col): _*)
      .agg(
        min_by(col(valueCol), struct(-col(countName), col(valueCol))).as(valueCol),
        max(col(countName)).as(countName))
  }
}

/** A3/A6: the Counter-addition commutative monoid
  * (`agg_func: x + y` over `collections.Counter`,
  * profile_daily.py:144-145,157-172) as a typed, spill-friendly
  * `Aggregator`. Buffer is a plain Map[String,Long]; merge is key-wise sum —
  * associative + commutative, so Spark runs it partial/final with map-side
  * combine. Registered via `udaf` or used as a TypedColumn.
  */
class MapCounterAgg extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
  def zero: Map[String, Long] = Map.empty
  def reduce(b: Map[String, Long], a: Map[String, Long]): Map[String, Long] = merge(b, a)
  def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    // fold the smaller map into the larger to keep merge O(min(n,m))
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    small.foldLeft(large) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
  }
  def finish(reduction: Map[String, Long]): Map[String, Long] = reduction
  def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
