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
    * ReadSchema). The events table's `ts` column is normalized to a
    * session-zoned micros timestamp whatever the writer emitted — see
    * [[normalizeEventTs]]. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") normalizeEventTs(spark.read.parquet(path))
    else spark.read.parquet(path)
  }

  /** Normalize an events frame's `ts` to a session-zoned micros TIMESTAMP,
    * adapting to whichever physical type the parquet writer used:
    *
    *   - TIMESTAMP(NANOS) read as raw Long via
    *     spark.sql.legacy.parquet.nanosAsLong=true → truncate ns→us
    *     (the same truncation DuckDB applies, so oracles agree);
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) read as TIMESTAMP_NTZ →
    *     cast to TIMESTAMP, which with session tz UTC (all session builders
    *     set it) pins the identical instant DuckDB's naive read yields;
    *   - already TIMESTAMP → pass through.
    *
    * The testdata generator has produced both layouts across rounds; at
    * 100 TB a corpus accretes files from several writer generations, so a
    * schema-adaptive reader is the production-correct shape, not a
    * test-only concession. Streaming callers share this (the file-source
    * schema is fixed up-front, so the dtype dispatch is plan-time only). */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        // the NTZ→timestamp cast pins the instant only under a UTC session
        // zone; an ad-hoc session in another zone would silently shift
        // every instant by the zone offset and fail oracles downstream
        // with no diagnostic — fail loudly here instead (the same posture
        // the old nanosAsLong-path require had)
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"normalizeEventTs: TIMESTAMP_NTZ events require spark.sql.session.timeZone=UTC (got $tz)")
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
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
