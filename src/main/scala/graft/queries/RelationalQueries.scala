package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables.table
import graft.ops.{Aggs, Joins, Windows}

/** Relational operator surface (SURVEY.md §2.1-§2.5): one named query per
  * operator, each with a DuckDB oracle twin in [[graft.SparkEntry.oracleSql]].
  *
  * Determinism: every query ends in ORDER BY over a unique key; doubles are
  * rounded; counts stay BIGINT on both engines.
  *
  * Scale stance (100 TB): fact-fact joins shuffle on join keys with partial
  * aggregation pushed below the shuffle; dimension joins broadcast; windows
  * partition on high-cardinality keys only.
  */
object RelationalQueries {

  /** A1+A3/A4 sums: TPC-H Q1-shaped pricing summary. One narrow shuffle
    * (6 groups), partial+final hash agg. */
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

  /** §7.2 minimum slice — A1+J1 "earliest ping per client" on testdata:
    * orders ⋈ broadcast(customer) → groupBy min. */
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

  /** J2: multi-key equi join (reference joins on client_id AND submission,
    * profile_daily.py:24-39) — aggregate per (partkey, suppkey), join back
    * to the fact on both keys. Self-join on the same source lets Spark
    * reuse the scan (exchange reuse). */
  def partSuppJoin(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val ps = li.groupBy("l_partkey", "l_suppkey")
      .agg(round(sum("l_quantity"), 2).as("ps_qty"),
           count(lit(1)).as("ps_lines"))
    li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .join(ps, Seq("l_partkey", "l_suppkey"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
              "ps_qty", "ps_lines")
      // (orderkey, linenumber) is not unique in the synthetic data — order
      // by all keys so ties are between fully identical rows.
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
  }

  /** J1 intended semantics: LEFT SEMI cohort restriction (SURVEY.md §2.3). */
  def semiJoinCustomers(s: SparkSession, dir: String): DataFrame =
    Joins.semi(
        table(s, dir, "customer"),
        table(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"))
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** Anti join — customers with no orders. */
  def antiJoinCustomers(s: SparkSession, dir: String): DataFrame =
    Joins.anti(
        table(s, dir, "customer"),
        table(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"))
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** J4: full outer join of a keyed aggregate against a dimension with
    * null-side coalescing — the reference's profile assembly
    * (profile_daily.py:58,209-221) without the `option()` dance. */
  def fullOuterProfile(s: SparkSession, dir: String): DataFrame = {
    val ordAgg = table(s, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      .groupBy("custkey")
      .agg(count(lit(1)).as("n_orders"),
           round(sum("o_totalprice"), 2).as("total_spend"))
    val cust = table(s, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_name"), col("c_acctbal"))
    Joins.fullOuter(ordAgg, cust, Seq("custkey"))
      .select(
        col("custkey"),
        coalesce(col("c_name"), lit("<none>")).as("name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spend"), lit(0.0)).as("total_spend"))
      .orderBy("custkey")
  }

  /** J3+F5: equi join then range predicate — "history within 14 days of
    * each key's min date" (profile_daily.py:118-139). Stays one shuffled
    * equi join; the range filter is evaluated inside it. */
  def recentWindowAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
    val minTs = ev.groupBy("user_id").agg(min("ts").as("min_ts"))
    Joins.equiRangeJoin(ev, minTs, Seq("user_id"),
        col("ts") <= col("min_ts") + expr("INTERVAL 14 DAYS"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id")
  }

  /** W1: per-key top-k with deterministic tie-break (unique o_orderkey). */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame =
    Windows.topKPerKey(
        table(s, dir, "orders"),
        partitionBy = Seq(col("o_custkey")),
        orderBy = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)
      .select(col("o_custkey"), col("rn").cast("long").as("rn"),
              col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")

  /** W1 via the engine's native bounded-heap top-k operator
    * ([[graft.plans.TopKPerKey]]): same semantics and oracle as
    * [[topOrdersPerCustomer]], but k rows per key cross the shuffle
    * instead of the whole table being sorted. */
  def topOrdersNative(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey(
        table(s, dir, "orders"),
        keyNames = Seq("o_custkey"),
        orderBy = Seq(graft.plans.TopKPerKey.SortKey("o_totalprice", asc = false),
                      graft.plans.TopKPerKey.SortKey("o_orderkey")),
        k = 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
              col("o_totalprice"))
      .orderBy("o_custkey", "rn")

  /** A5/A6: deterministic mode — most frequent order priority per customer,
    * ties to the smallest string (the reference's `most_common()[0][0]` is
    * tie-unstable; SURVEY.md §3.1). */
  def modePriority(s: SparkSession, dir: String): DataFrame =
    Aggs.modePerGroup(table(s, dir, "orders"), Seq("o_custkey"),
                      "o_orderpriority")
      .select("o_custkey", "o_orderpriority", "cnt")
      .orderBy("o_custkey")

  /** A4: conditional-count funnel (`sum(int(event == X))`,
    * profile_daily.py:176-197). */
  def eventFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
    ev.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        Aggs.countIf(col("event_type") === "signup").as("signups"),
        Aggs.countIf(col("event_type") === "click").as("clicks"),
        Aggs.countIf(col("event_type") === "view").as("views"),
        Aggs.countIf(col("event_type") === "purchase").as("purchases"),
        Aggs.countIf(col("event_type") === "error").as("errors"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id")
  }

  /** A2: distinct over a projection. */
  def distinctSegments(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer")
      .select("c_nationkey", "c_mktsegment")
      .distinct()
      .orderBy("c_nationkey", "c_mktsegment")

  /** U1: union / intersect / except in one labeled result. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val a = table(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
    val b = table(s, dir, "customer").where(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k")).distinct()
    a.intersect(b).withColumn("op", lit("in_both"))
      .union(a.except(b).withColumn("op", lit("orders_only")))
      .union(b.except(a).withColumn("op", lit("rich_only")))
      .orderBy("k", "op")
  }

  /** §2.7 JSON shredding of the events.props string column. */
  def jsonShred(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .select(
        col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
      .orderBy("event_id")

  /** C1/C5/C12 string functions (split/substr/concat_ws/regexp/…). */
  def stringFuncs(s: SparkSession, dir: String): DataFrame = {
    // C4: the reference's `.rstrip("\0")[4:-4]` decrypt post-processing
    // (testpilot_data.py:102) — applied to a NUL-padded value built
    // in-plan so the strip itself is value-checked
    val padded = concat(col("c_name"), lit("\u0000\u0000\u0000"))
    // C13/F4: deterministic uuid-shaped string (md5 hex in 8-4-4-4-12
    // grouping) + the regex validity predicate (profile_daily.py:70-77)
    val h = md5(col("c_name"))
    val uuidStr = concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
      substring(h, 13, 4), substring(h, 17, 4), substring(h, 21, 12))
    table(s, dir, "customer")
      .select(
        col("c_custkey"),
        split(col("c_name"), "#").getItem(1).as("name_num"),
        substring(col("c_name"), 1, 8).as("name_head"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        length(col("c_name")).cast("long").as("name_len"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey")).as("seg_key"),
        reverse(col("c_name")).as("name_rev"),
        regexp_replace(col("c_name"), "[0-9]", "x").as("name_masked"),
        graft.etl.Clean.stripPadAndTrim(padded).as("trimmed"),
        uuidStr.as("uuid_str"),
        graft.etl.Clean.isValidUuid(col("c_name")).as("name_is_uuid"))
      // F4: UUID-validity as a row filter (keeps all rows here — every
      // generated uuid_str is valid — but the predicate runs in-plan)
      .where(graft.etl.Clean.isValidUuid(uuidStr))
      .orderBy("c_custkey")
  }

  /** C9/C10 date functions (parse/format/diff/trunc/epoch). */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        // o_orderdate reads as TIMESTAMP_NTZ; session tz is UTC, so casting
        // to LTZ yields the same instant DuckDB's epoch_us reports.
        unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"))
      .orderBy("o_orderkey")

  /** P3: null-on-error via try_cast / try_divide — the reference's
    * `try/except → None` cell contract (testpilot_data.py:57-61). */
  def tryCastCleaning(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .select(
        col("event_id"),
        // regex gates before BOTH try_casts: the failure path is
        // exception-based (~9 µs/cell measured vs ~1 µs for the gate), so
        // garbage short-circuits to null without entering the parser. The
        // gate is value-neutral: it admits every string the cast can
        // accept (optional sign, digits, surrounding whitespace; overflow
        // still nulls inside try_cast). Ungated, this all-garbage column
        // was ~0.9 s/round at sf0.1 — and the orderBy's range-partition
        // sampling pass evaluates the projection a second time, doubling
        // it; gated, full-query cost drops 2.4 s → ~0.4 s.
        when(col("event_type").rlike("^\\s*[+-]?[0-9]+\\s*$"),
          col("event_type").try_cast("long")).as("bad_long"),
        regexp_extract(col("props"), "[0-9]+", 0).try_cast("long").as("k"),
        try_divide(col("value"), lit(0)).as("div0"),
        when(col("event_type").rlike("^[0-9]{4}"),
          col("event_type").try_cast("date")).cast("string").as("bad_date"))
      .orderBy("event_id")

  /** A3 (map-monoid, relational form): per-user event-type counter rendered
    * as a deterministically sorted "k:v" string — byte-stable across
    * engines. */
  def typeCountMap(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(array_join(
             array_sort(collect_list(concat_ws(":", col("event_type"),
                                               col("cnt")))), ",")
           .as("type_counts"))
      .orderBy("user_id")

  /** §2.7 JSON shredding via from_json with an explicit schema (the
    * schema-declared variant of q13's get_json_object path extraction —
    * at scale, one parse per row instead of one per path). */
  def fromJsonShred(s: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    table(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), schema).as("p"))
      .select(col("event_id"), col("event_type"),
        col("p").getField("k").as("prop_k"))
      .orderBy("event_id")
  }

  /** The general window-function surface beyond top-k ranking: lag/lead
    * offsets, rank/dense_rank (tie-stable by definition — equal inputs get
    * equal ranks), ntile bucketing, cume_dist, and a cumulative sum over
    * an exact DECIMAL (float accumulation order inside a window frame is
    * engine-private — DuckDB uses a segment tree — so cross-engine
    * determinism requires an associative-exact type, not rounding). The
    * window order (o_orderdate, o_orderkey) is unique per partition. */
  def windowSuite(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(s, dir, "orders")
      .withColumn("price_dec", col("o_totalprice").cast("decimal(18,2)"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        lag("o_orderkey", 1).over(w).as("prev_key"),
        lead("o_orderkey", 1).over(w).as("next_key"),
        rank().over(wPrice).cast("long").as("price_rank"),
        dense_rank().over(wPrice).cast("long").as("price_dense_rank"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(cume_dist().over(w), 4).as("cume"),
        sum(col("price_dec")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont`). */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
      .orderBy("o_orderpriority")

  /** Approximate percentiles (mergeable quantile sketch) sanity-checked
    * against the exact interpolated percentile: engines' sketches differ
    * in implementation, so — like q46's HLL check — the comparable output
    * is the accuracy FLAG (estimate within 2% of exact), not the
    * estimate. At 100 TB the sketch is the only option: it merges
    * map-side, while exact percentile materializes every group's values. */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("exact_p50"),
        (abs(expr("percentile_approx(o_totalprice, 0.5, 1000)") -
             expr("percentile(o_totalprice, 0.5)")) <=
          expr("percentile(o_totalprice, 0.5)") * 0.02).as("p50_ok"),
        (abs(expr("percentile_approx(o_totalprice, 0.9, 1000)") -
             expr("percentile(o_totalprice, 0.9)")) <=
          expr("percentile(o_totalprice, 0.9)") * 0.02).as("p90_ok"))
      .orderBy("o_orderpriority")

  /** Statistical aggregates: correlation, sample stddev/variance,
    * covariance. */
  def statsAgg(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qty_price"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6)
          .as("cov_qty_disc"))
      .orderBy("l_returnflag")

  /** Higher-order array functions over the embedding column: aggregate
    * (fold), filter, transform, array_max/min — the composable surface the
    * custom expressions specialize. */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("sum_all"),
        size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
        round(array_max(col("embedding")).cast("double"), 6).as("max_v"),
        round(array_min(col("embedding")).cast("double"), 6).as("min_v"),
        round(aggregate(transform(col("embedding"),
            x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x), 4).as("sum_sq"))
      .orderBy("vec_id")

  /** K3 + SQL-string surface parity (the reference drives everything
    * through SQL strings, profile_daily.py:16-39): raw spark.sql with a
    * correlated scalar subquery and EXISTS — identical text runs on the
    * oracle. */
  def sqlSurface(s: SparkSession, dir: String): DataFrame = {
    graft.io.Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Null semantics: null-safe equality (<=>), IS NULL, coalesce, and
    * NULLS FIRST ordering over an injected-null column. */
  def nullSemantics(s: SparkSession, dir: String): DataFrame = {
    val v = when(col("o_orderkey") % 3 === 0, lit(null))
      .otherwise(col("o_totalprice"))
    table(s, dir, "orders")
      .select(col("o_orderkey"), v.as("v"))
      .select(
        col("o_orderkey"), col("v"),
        col("v").isNull.as("is_null"),
        (col("v") <=> lit(null)).as("eq_null"),
        coalesce(col("v"), lit(-1.0)).as("v_or_default"))
      .orderBy(col("v").asc_nulls_first, col("o_orderkey"))
  }

  /** Pivot: event_type → one count column per type (reference A4 is a
    * hand-rolled pivot). */
  def pivotEventCounts(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** Rollup with grouping flag (engine-surface extension; DuckDB ROLLUP
    * oracle). */
  def rollupNation(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer")
      .rollup(col("c_nationkey"))
      .agg(grouping(col("c_nationkey")).cast("long").as("is_total"),
           count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
      .select(
        coalesce(col("c_nationkey"), lit(-1)).cast("long").as("nationkey"),
        col("is_total"), col("n"), col("bal"))
      .orderBy("nationkey", "is_total")

  /** Mergeable HLL sketches (DataSketches `hll_sketch_agg`): per-day
    * sketches of distinct users built independently, then UNIONED per
    * event type (`hll_union_agg`) — the incremental distinct-count
    * pattern at 100 TB, where daily sketch partials persist and any
    * date-range distinct is a cheap union instead of a re-scan. Gate in
    * the q46 accuracy-flag style: the union's estimate must sit within
    * 5% of the exact distinct (sketch internals are engine-specific; the
    * exact count and the flag are the oracle-checked values). */
  def hllSketchUnion(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        to_date(col("ts")).as("day"))
    val daily = ev.groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val unioned = daily.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(unioned, "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * 0.05).as("union_ok"))
      .orderBy("event_type")
  }

  /** Fuzzy string matching surface: edit distance (the blocking-free
    * fallback of entity resolution), character translation masking, and
    * padding — all codegen'd builtins in both engines. */
  def stringDistance(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        levenshtein(col("c_name"), reverse(col("c_name"))).cast("long")
          .as("lev_rev"),
        levenshtein(col("c_name"),
          translate(col("c_name"), "0123456789", "XXXXXXXXXX")).cast("long")
          .as("lev_mask"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("segment_t"))
      .orderBy("c_custkey")

  /** Salted skew join, oracle-proven result-identical to the plain join:
    * the hot-key side gets a deterministic hash salt, the dim side is
    * replicated saltFactor times, so one hot key spreads over saltFactor
    * reducers instead of melting one ([[graft.ops.Skew.saltedJoin]]).
    * events.user_id has exactly the heavy-per-key shape that motivates
    * salting (~4k events/user at sf0.1). */
  def saltedSkewJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events").select("user_id", "event_id", "value")
    val dim = table(s, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("user_events"))
    graft.ops.Skew.saltedJoin(ev, dim, "user_id",
        saltSource = Seq("event_id"), saltFactor = 8)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"),
        max("user_events").as("user_events"))
      .orderBy("user_id")
  }

  /** Snapshot upsert (MERGE semantics): a pre-1996 per-customer snapshot
    * merged with the 1996+ delta — matched keys take the delta row,
    * unmatched base rows survive, delta-only keys insert
    * ([[graft.ops.Merge.upsert]]: one full-outer shuffle). */
  def snapshotUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    def agg(part: DataFrame): DataFrame = part
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("spend"),
        date_format(max("o_orderdate"), "yyyy-MM-dd").as("last_day"))
    val base = agg(o.where(col("o_orderdate") < lit("1996-01-01")))
    val delta = agg(o.where(col("o_orderdate") >= lit("1996-01-01")))
    graft.ops.Merge.upsert(base, delta, Seq("o_custkey"))
      .orderBy("o_custkey")
  }

  /** Type-2 SCD merge ([[graft.ops.Scd.applyType2]]): each customer's
    * latest order priority pre-1996 is the base dimension; the 1996+
    * latest is the delta. Changed keys get their old version closed and a
    * new current one opened; unchanged keys keep one row; new keys
    * insert. The versioned-history warehouse staple next to the Type-1
    * upsert (q70). */
  def scdType2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = table(s, dir, "orders")
    def latest(part: DataFrame): DataFrame = {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      part.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col("o_custkey"), col("o_orderpriority").as("priority"))
    }
    val base = latest(o.where(col("o_orderdate") < lit("1996-01-01")))
      .withColumn("valid_from", lit("1995-01-01"))
      .withColumn("valid_to", lit(null).cast("string"))
    val delta = latest(o.where(col("o_orderdate") >= lit("1996-01-01")))
      .withColumn("eff", lit("1996-01-01"))
    graft.ops.Scd.applyType2(base, delta, Seq("o_custkey"),
        Seq("priority"), "eff")
      .orderBy("o_custkey", "valid_from")
  }

  /** Single-pass column profiling ([[graft.ops.Profile.profile]]): one
    * aggregation (multi-distinct Expand) computes rows/nulls/distincts/
    * min/max for every profiled column, then unpivots — the input scans
    * once no matter how many columns are profiled. */
  def columnProfile(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.profile(
        table(s, dir, "events")
          .select("event_id", "user_id", "event_type", "props"),
        Seq("event_id", "user_id", "event_type", "props"))
      .orderBy("col_name")

  /** As-of join: for every purchase, the latest signup at-or-before it by
    * the same user (nearest-predecessor semantics — the feature-join
    * staple). Union+window implementation: one shuffle, no range join —
    * see [[graft.ops.Joins.asOf]]. Left-outer: purchases with no prior
    * signup keep a null signup time. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"))
    graft.ops.Joins.asOf(purchases, signups, Seq("user_id"), "ts", "ts")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("purchase_us"),
        round(col("value"), 2).as("purchase_value"),
        unix_micros(col("asof_ts")).as("signup_us"))
      .orderBy("event_id")
  }

  /** Explicit GROUPING SETS with MULTIPLE DISTINCT aggregates in one
    * aggregation — the two Expand-operator paths of Spark's aggregation
    * surface in a single plan. `count(DISTINCT x), count(DISTINCT y)`
    * plans as ONE Expand (inputs replicated per distinct group, null-
    * padded, then two-phase aggregated) — NOT two self-joined aggregates;
    * the grouping-sets list plans as a second Expand over the grouping
    * keys. At 100 TB both stay two-shuffle plans with map-side partials
    * regardless of how many distinct columns or grouping sets ride along. */
  def groupingSetsMultiDistinct(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
           grouping(col("o_orderpriority")).cast("long").as("g_prio"),
           countDistinct(col("o_custkey")).as("n_cust"),
           countDistinct(col("o_orderpriority")).as("n_prio"),
           count(lit(1)).as("n_orders"),
           round(sum("o_totalprice"), 2).as("spend"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_status"), col("g_prio"), col("n_cust"), col("n_prio"),
        col("n_orders"), col("spend"))
      .orderBy("status", "priority", "g_status", "g_prio")

  /** Data-quality expectations (q88): declarative null/range/uniqueness
    * checks over lineitem — the validation gate an ingest pipeline runs
    * before promoting a partition. All four row checks share ONE scan
    * (one conditional-count aggregation); each uniqueness check is one
    * hash aggregation on its keys. Two checks are designed to FAIL
    * (quantity_under_25, orderkey_unique) so violation counting is
    * exercised, not just the all-green path. */
  def expectations(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Expectations.{RowCheck, UniqueCheck}
    graft.ops.Expectations.check(table(s, dir, "lineitem"),
      rows = Seq(
        RowCheck("discount_in_range", col("l_discount").between(0.0, 0.1)),
        RowCheck("orderkey_not_null", col("l_orderkey").isNotNull),
        RowCheck("quantity_in_range", col("l_quantity").between(1.0, 50.0)),
        RowCheck("quantity_under_25", col("l_quantity") < 25.0)),
      uniques = Seq(
        UniqueCheck("lineitem_key_unique",
          Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),
        UniqueCheck("orderkey_unique", Seq("l_orderkey"))))
      .orderBy("check_name")
  }

  /** Cube over two keys with grouping flags. */
  def cubeReturnStatus(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("long").as("g_rf"),
           grouping(col("l_linestatus")).cast("long").as("g_ls"),
           count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_rf"), col("g_ls"), col("n"), col("qty"))
      .orderBy("returnflag", "linestatus", "g_rf", "g_ls")

  /** Hourly resample + forward fill over the event log (q162,
    * [[graft.ops.Windows.resampleFfillHourly]]): every user's activity
    * densified onto the hourly grid between their first and last event,
    * gap hours carrying the last observed value and n_events = 0 — the
    * time-series preparation step in front of dashboards and windowed
    * feature builds. Hour formatting mirrors q40's convention. */
  def resampleFfill(s: SparkSession, dir: String): DataFrame =
    Windows.resampleFfillHourly(table(s, dir, "events"),
        col("user_id"), col("ts"), col("event_id"), col("value"))
      .select(col("key").as("user_id"),
        date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        round(col("value_ffill"), 2).as("value_ffill"),
        col("n_events"))
      .orderBy("user_id", "hour_start")

  /** Weekly cohort retention (q208) — the product-analytics staple:
    * users cohorted by the ISO week of their FIRST signup; for every
    * (cohort, week offset ≥ 0) cell, how many cohort members were
    * active (any event) that week, as a count and a share of the
    * cohort. Three aggregations, all keyed and map-side-combining:
    * per-user first signup, distinct (user, week) activity, and the
    * (cohort, offset) rollup; the cohort-size join is a broadcast of
    * ≤weeks rows. Week arithmetic is integer day-diff div 7 on
    * week-truncated stamps — exact cross-engine. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
    val signup = ev.where(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cw"))
    val act = ev.select(col("user_id"), date_trunc("week", col("ts")).as("aw"))
      .join(signup, "user_id")
      .where(col("aw") >= col("cw"))
      .select(col("user_id"), col("cw"),
        (datediff(col("aw"), col("cw")) / 7).cast("long").as("week_offset"))
      .distinct()
    val sizes = signup.groupBy("cw")
      .agg(count(lit(1)).as("cohort_size"))
    act.groupBy("cw", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cw")
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 4)
          .as("retention"))
      .orderBy("cohort_week", "week_offset")
  }
}
