package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the harness testdata layout: one parquet file per
  * table under a scale-factor directory (see /root/repo/TESTDATA.md).
  *
  * Re-creates the reference's source surface (SURVEY.md §2.1):
  *   - S1/S2 parquet scans (reference: `sqlContext.read.parquet(...)`,
  *     /root/reference/cliqz_etl/profile_daily.py:11-14) with partition /
  *     predicate pushdown left to Catalyst,
  *   - K3 temp-view registration (profile_daily.py:12,14).
  *
  * At 100 TB these would be directories of many files (optionally
  * partitioned / bucketed); the API takes a directory + table name so the
  * same code path serves both a single file and a partitioned layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan. Column pruning + filter pushdown are automatic once the
    * downstream plan is pure-Column (verify with `.explain`: PushedFilters,
    * ReadSchema).
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects by default; we read it as raw nanos
    * (legacy.parquet.nanosAsLong) and truncate to a micros timestamp —
    * the same ns→us truncation DuckDB applies, so oracles agree. The conf
    * must be set AT SESSION BUILD (as Verify/Bench/tests do) — a read
    * helper silently mutating session state was a hidden global side
    * effect, so this now asserts instead. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      require(
        spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .contains("true"),
        "events.ts is parquet TIMESTAMP(NANOS): build the session with " +
          "spark.sql.legacy.parquet.nanosAsLong=true")
      spark.read.parquet(path)
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(path)
  }

  /** CSV read with header + explicit nullability (reference S3:
    * testpilot_data.py:172-173 — but kept as DataFrame, no `.rdd` detour). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Register every testdata table as a temp view (K3), enabling
    * `spark.sql` parity with the reference's SQL strings. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
