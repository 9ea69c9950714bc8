package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — declarative validation checks evaluated
  * against a frame, the gate a large-scale ingest pipeline runs before
  * promoting a partition (null-rate, range, set-membership, uniqueness).
  * Inspired by the dbt-test / Great-Expectations surface, re-expressed as
  * pure Spark aggregates.
  *
  * Scale shape: every ROW-level expectation compiles to one conditional
  * count inside a SINGLE aggregation pass over the frame (one scan, no
  * shuffle beyond the final 1-row partial-agg merge); each UNIQUENESS
  * expectation adds one hash-aggregation on its key columns (the groupBy
  * is the check — there is no cheaper distributed uniqueness test).
  * Output is one row per expectation: (check, violations, pass).
  */
object Expectations {

  /** A named row-level predicate that every row must satisfy. */
  final case class RowCheck(name: String, predicate: Column)

  /** A named key whose combination must be unique across the frame. */
  final case class UniqueCheck(name: String, keys: Seq[String])

  /** Evaluate all checks. Row checks share one scan; each unique check
    * is one groupBy counting keys seen more than once. */
  def check(df: DataFrame, rows: Seq[RowCheck],
            uniques: Seq[UniqueCheck] = Nil): DataFrame = {
    require(rows.nonEmpty || uniques.nonEmpty,
      "at least one expectation required")
    val rowResults: Option[DataFrame] =
      if (rows.isEmpty) None
      else {
        val aggs = rows.map { c =>
          // violation = predicate is false OR null (null-safe: an
          // expectation that cannot be evaluated on a row is a violation)
          sum(when(coalesce(c.predicate, lit(false)), 0L).otherwise(1L))
            .as(c.name)
        }
        val wide = df.agg(aggs.head, aggs.tail: _*)
        // unpivot the 1-row wide frame into (check_name, violations)
        Some(wide.select(explode(map(
          rows.flatMap(c => Seq(lit(c.name), col(c.name))): _*))
          .as(Seq("check_name", "violations"))))
      }
    val uniqueResults: Seq[DataFrame] = uniques.map { u =>
      df.groupBy(u.keys.map(col): _*)
        .agg(count(lit(1)).as("_n"))
        .where(col("_n") > 1)
        .agg(coalesce(sum(col("_n") - 1), lit(0L)).as("violations"))
        .select(lit(u.name).as("check_name"), col("violations"))
    }
    (rowResults.toSeq ++ uniqueResults)
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
  }
}
