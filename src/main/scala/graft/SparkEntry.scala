package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Aggs, Joins}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named query here with a
  * DuckDB-runnable oracle twin in [[oracleSql]]. Determinism rules:
  * explicit ORDER BY on a unique key in both engines, doubles rounded,
  * timestamps emitted as formatted strings or epoch integers, integer sums
  * CAST to BIGINT in DuckDB (its SUM(BIGINT) returns HUGEINT).
  */
object SparkEntry {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> Queries.pricingSummary,
    "q02_earliest_order" -> Queries.earliestOrder,
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_earliest_order" ->
      """SELECT c_custkey, c_name,
        |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
  )
}

/** Query implementations, one per SURVEY.md §2 operator (grown per round). */
object Queries {
  import Tables.table

  /** A1+A4-style pricing summary (TPC-H Q1 shape): scan → hash agg with
    * partial/final combine → sort. Exercises S2, A1, A3-sums, C11.
    * Scale: one shuffle on the (tiny-cardinality) group key; partial agg
    * means the shuffle carries ~6 rows per map task regardless of input
    * size. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Minimum end-to-end slice (SURVEY.md §7.2): "earliest ping per client"
    * (reference A1+J1, profile_daily.py:16-22) transplanted to testdata:
    * orders ⋈ customer → groupBy(min). The customer side is a dimension →
    * broadcast join; the agg shuffles on c_custkey once. */
  def earliestOrder(s: SparkSession, dir: String): DataFrame =
    Joins.dimJoinOn(
        table(s, dir, "orders"),
        table(s, dir, "customer").select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(
        date_format(min("o_orderdate"), "yyyy-MM-dd").as("first_order"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_custkey")
}
