package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import graft.etl.{ColumnSpec, FrameConfig}
import graft.io.Tables.table
import graft.ops.{Aggs, Joins}

/** End-to-end re-creations of the reference's two jobs (SURVEY.md §3) plus
  * the crypto / fingerprint / typed-Aggregator surface.
  */
object PipelineQueries {

  /** E1 — testpilot_data.main re-created (testpilot_data.py:84-202): the
    * whole config→extract→clean→filter chain as ONE Catalyst plan over the
    * events table. The reference's per-row Python `ping_to_row` becomes a
    * declarative [[FrameConfig]] projection; null-on-error comes from
    * try_cast, not per-cell try/except. */
  def e1ConfigExtract(s: SparkSession, dir: String): DataFrame = {
    val cfg = FrameConfig(
      columns = Seq(
        ColumnSpec("event_id", col("event_id")),
        ColumnSpec("day", date_format(col("ts"), "yyyy-MM-dd")),
        ColumnSpec("user_id", col("user_id")),
        ColumnSpec("event_type", col("event_type")),
        // JSON path extraction (P1/§2.7) + typed cast with null-on-error (P3)
        ColumnSpec("prop_k", get_json_object(col("props"), "$.k"),
                   castTo = Some(org.apache.spark.sql.types.LongType)),
        ColumnSpec("value_r", round(col("value"), 2))),
      // F1 analog of `ping_filter` (testpilot_data.py:20,41-42)
      preFilter = Some(col("event_type") =!= "error"),
      // F2 analog of the post-projection SQL filter (testpilot_data.py:167)
      postFilter = Some(col("prop_k").isNotNull))
    cfg(table(s, dir, "events")).orderBy("event_id")
  }

  /** E2 — profile_daily.main re-created (profile_daily.py:9-67) on testdata
    * roles: orders = testpilot pings, lineitem-via-orders = main_summary
    * history, customer = profile dimension.
    *
    * Shape: cohort min-date → history join + 14-day range filter → two
    * keyed monoid aggregations → FULL OUTER join on (custkey, day) →
    * null-coalesced wide profile row. One Catalyst plan; no driver
    * round-trip (the reference's HBase driver-side detour, SURVEY.md §3/E2
    * step 5, becomes a plain distributed join). */
  def e2ProfileDaily(s: SparkSession, dir: String): DataFrame = {
    val ord = table(s, dir, "orders").select(
      col("o_custkey").as("custkey"),
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
      col("o_orderstatus"), col("o_totalprice"))

    // A1: earliest activity per client (min on yyyy-MM-dd strings is
    // chronological)
    val minDay = ord.groupBy("custkey").agg(min("day").as("min_day"))

    // History side: lineitems reached through orders, kept when shipped
    // within 14 days of the client's first order (F5 window semantics,
    // profile_daily.py:127-135)
    val li = table(s, dir, "lineitem").select(
      col("l_orderkey").as("o_orderkey"),
      date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"),
      col("l_quantity"), col("l_returnflag"))
    val hist = li
      .join(ord.select("custkey", "o_orderkey"), Seq("o_orderkey"))
      .join(minDay, Seq("custkey"))
      .where(datediff(to_date(col("day")), to_date(col("min_day")))
        .between(0, 14))
    // A3: keyed monoid aggregation — sums + a Counter-style map rendered as
    // a sorted string (deterministic across engines)
    val histAgg = hist.groupBy("custkey", "day").agg(
      round(sum("l_quantity"), 2).as("qty"),
      count(lit(1)).as("n_lines"),
      Aggs.countIf(col("l_returnflag") === "R").as("n_returns"))

    // A4: testpilot-side conditional counts per (client, day)
    val txpAgg = ord.groupBy("custkey", "day").agg(
      Aggs.countIf(col("o_orderstatus") === "O").as("open_orders"),
      Aggs.countIf(col("o_orderstatus") === "F").as("done_orders"),
      Aggs.countIf(col("o_orderstatus") === "P").as("pending_orders"),
      round(sum("o_totalprice"), 2).as("spend"))

    // J4: full outer on the composite key, then null-safe wide row
    // (format_row, profile_daily.py:209-242, as plain coalesce)
    val profile = Joins.fullOuter(histAgg, txpAgg, Seq("custkey", "day"))
      .select(
        col("custkey"), col("day"),
        coalesce(col("qty"), lit(0.0)).as("qty"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_returns"), lit(0L)).as("n_returns"),
        coalesce(col("open_orders"), lit(0L)).as("open_orders"),
        coalesce(col("done_orders"), lit(0L)).as("done_orders"),
        coalesce(col("pending_orders"), lit(0L)).as("pending_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))

    // Profile dimension join (broadcast — customer is a dim table)
    Joins.dimJoinOn(profile,
        table(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"),
                  col("c_nationkey").cast("long").as("nationkey")),
        cond = col("custkey") === col("c_custkey"))
      .drop("c_custkey")
      .orderBy("custkey", "day")
  }

  /** A3/A6 typed path: the Counter-addition monoid as a spill-friendly
    * `Aggregator` over a typed Dataset (profile_daily.py:142-197). Same
    * oracle as the relational q17 — proves the two formulations agree. */
  def mapMonoidUdaf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = table(s, dir, "events")
      .select(col("user_id"), col("event_type")).as[(Long, String)]
    val counted = ev.groupByKey(_._1)
      .agg(PipelineQueries.typeCounter.toColumn.name("counts"))
    counted
      .map { case (uid, m) =>
        (uid, m.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }
          .mkString(","))
      }
      .toDF("user_id", "type_counts")
      .orderBy("user_id")
  }

  private[queries] val typeCounter: Aggregator[(Long, String), Map[String, Long], Map[String, Long]] =
    new Aggregator[(Long, String), Map[String, Long], Map[String, Long]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(b: Map[String, Long], a: (Long, String)): Map[String, Long] =
        b.updated(a._2, b.getOrElse(a._2, 0L) + 1L)
      def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
        val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
        small.foldLeft(large) { case (acc, (k, v)) =>
          acc.updated(k, acc.getOrElse(k, 0L) + v)
        }
      }
      def finish(r: Map[String, Long]): Map[String, Long] = r
      def bufferEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
      def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }

  /** C2/C3/C4: base64 + AES-ECB encrypt/decrypt round trip
    * (testpilot_data.py:98-106 decrypts an AES-ECB, base64-wrapped id).
    * ECB with a fixed key is deterministic, so decrypt(unbase64(base64(
    * encrypt(x)))) == x and the oracle is the identity projection. */
  def aesRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val key = lit("0123456789abcdef").cast("binary")
    val ct = aes_encrypt(col("c_name").cast("binary"), key, lit("ECB"))
    val roundtrip = aes_decrypt(unbase64(base64(ct)), key, lit("ECB"))
    table(s, dir, "customer")
      .select(col("c_custkey"), roundtrip.cast("string").as("decrypted"))
      .orderBy("c_custkey")
  }

  /** Document fingerprinting: cryptographic (md5/sha256 — byte-identical in
    * any engine) plus the rolling polynomial hash in two formulations:
    * higher-order-function Columns (oracle-matched vs DuckDB list_reduce)
    * and the codegen'd [[graft.functions.PolyHash]] native expression
    * (same value, faster; proven equal here by emitting both). */
  def fingerprints(s: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(s)
    val codes = transform(split(col("text"), ""),
      ch => ascii(ch).cast("long"))
    val rolling = aggregate(
      slice(codes, lit(2), greatest(size(codes) - 1, lit(0))),
      element_at(codes, 1),
      (acc, x) => (acc * 31 + x) % 2147483647L)
    table(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text")).as("md5_hex"),
        sha2(col("text"), 256).as("sha256_hex"),
        rolling.as("rolling_fp"),
        expr("poly_hash(text)").as("rolling_fp_native"))
      .orderBy("doc_id")
  }
}
