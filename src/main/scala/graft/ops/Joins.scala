package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join builders covering the reference's join surface (SURVEY.md §2.3
  * J1-J4) plus the strategies the reference couldn't express (semi/anti,
  * broadcast hints).
  *
  * Scale notes (100 TB):
  *  - equi joins shuffle both sides on the key; keep keys pre-projected so
  *    the shuffle rows are narrow;
  *  - dimension joins must broadcast — `dimJoin` forces the hint rather than
  *    trusting the 10 MB autoBroadcast threshold to see through a filter;
  *  - the range predicate of `equiRangeJoin` is applied *after* the
  *    equi-match inside the join, so Spark still plans a hash/sort-merge
  *    join keyed on the equi keys (never a nested-loop over ranges).
  */
object Joins {
  /** J1 intended semantics — cohort restriction is a LEFT SEMI, not an inner
    * join + later distinct (reference: profile_daily.py:16-22, see SURVEY.md
    * §2.3 note). Semi joins shuffle only the key column of the right side. */
  def semi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** Complement of `semi` — rows with no match. */
  def anti(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** J2: multi-key equi join (profile_daily.py:24-39 joins on client_id AND
    * submission). Using-columns form emits each key once. */
  def equi(left: DataFrame, right: DataFrame, keys: Seq[String],
           how: String = "inner"): DataFrame =
    left.join(right, keys, how)

  /** Fact ⋈ small dimension with an explicit broadcast hint — at cluster
    * scale this is the difference between a map-side join and a 100 TB
    * shuffle. */
  def dimJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
              how: String = "inner"): DataFrame =
    fact.join(broadcast(dim), keys, how)

  /** `dimJoin` with an explicit join condition (for differently-named key
    * columns, e.g. o_custkey = c_custkey). */
  def dimJoinOn(fact: DataFrame, dim: DataFrame, cond: Column,
                how: String = "inner"): DataFrame =
    fact.join(broadcast(dim), cond, how)

  /** J3+F5: equi join followed by a range predicate — the reference's
    * "main_summary rows within 14 days of each client's min_date" pattern
    * (profile_daily.py:49-52,118-139). Catalyst pushes `range` into the
    * join condition, so this stays a single shuffled equi join. */
  def equiRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                    range: Column): DataFrame =
    left.join(right, keys).where(range)

  /** As-of join: for each left row, the single right row with the largest
    * `rightTime <= leftTime` for the same key (the nearest-predecessor
    * join ubiquitous in telemetry/feature pipelines — "state as of this
    * event"). Unmatched left rows survive with nulls (left-outer
    * semantics).
    *
    * Implemented as union + running `last(_, ignoreNulls)` window rather
    * than a range join: both sides shuffle ONCE on the key and sort once
    * by time — O((|L|+|R|) log) per key partition — where a range join is
    * a per-key cross product filtered after the fact (quadratic in key
    * cardinality hot spots, and Spark plans non-equi conditions as the
    * dreaded nested loop when the equi key is skewed/absent). At 100 TB
    * the window form also needs no broadcast and inherits AQE skew
    * handling on the single exchange.
    *
    * Tie rules: a right row at exactly `leftTime` matches ("at or
    * before"); among right rows with equal time the one with the largest
    * `payload` struct wins (deterministic — payload fields compare
    * lexicographically).
    *
    * Output: ALL left columns plus each requested right payload column as
    * `asof_<name>` plus the matched right time as `asof_<rightTime>`. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightPayload: Seq[String] = Seq.empty): DataFrame = {
    val reserved = Seq("_t", "_side", "_r", "_m")
    require(!left.columns.exists(reserved.contains),
      s"asOf uses ${reserved.mkString("/")} internally; rename those left columns")
    val keyCols = keys.map(col)
    val payload = struct(col(rightTime).as("t") +: rightPayload.map(col): _*)
    val r = right.select(keyCols :+ col(rightTime).as("_t") :+
      lit(0).as("_side") :+ payload.as("_r"): _*)
    val l = left.withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    // left rows carry a null payload slot; unionByName aligns the schemas
    val u = l.withColumn("_r", lit(null).cast(r.schema("_r").dataType))
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols: _*)
      // right rows sort before left rows at equal times (at-or-before);
      // _r as the final key makes equal-time right rows deterministic
      .orderBy(col("_t").asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
    matched.where(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        (s"asof_$rightTime" +: rightPayload.map(p => s"asof_$p"))
          .zip("t" +: rightPayload)
          .map { case (out, in) => col("_m").getField(in).as(out) }: _*)
  }

  /** J4: full outer join of two keyed aggregates with coalesced keys
    * (profile_daily.py:58). Using-columns full outer already coalesces the
    * key columns into one; null-side field handling stays with the caller
    * (the reference's `option()` dance, profile_daily.py:200-221, becomes
    * plain `coalesce`). */
  def fullOuter(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "full_outer")
}
