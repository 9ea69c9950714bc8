package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.etl.{Clean, ColumnSpec, FrameConfig}
import graft.io.PartitionedWriter

/** The reference's daily job as a LIBRARY API — `testpilot_data.main`
  * (/root/reference/cliqz_etl/testpilot_data.py:84-202) re-expressed as a
  * parameterized Spark job: two doc-type configs projected from one
  * telemetry frame + one CSV-source config, written to three parquet
  * sinks, with the three frames returned (the reference returns
  * `testpilot_df, testpilottest_df, search_df` and writes when
  * `save=True`; same contract here).
  *
  * A user of the reference maps their call sites directly:
  * `main(sc, sqlContext, day, save)` →
  * `TestpilotDaily.run(spark, telemetry, searchCsv, sinks, save)` —
  * with configs swappable the way `DataFrameConfig` tuples were.
  */
object TestpilotDaily {

  /** spark-submit entry — the analog of the reference's notebook
    * orchestration (clone → build egg → addPyFile → main(sc, sqlContext),
    * scheduling/cliqz_load_and_run.ipynb): here it is one submitted jar.
    * `args`: telemetryParquetPath searchCsvPath outBaseDir */
  def main(args: Array[String]): Unit = {
    val Array(telemetryPath, csvPath, outBase) = args.take(3)
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    run(spark,
      spark.read.parquet(telemetryPath),
      graft.io.Tables.csv(spark, csvPath),
      Sinks(s"$outBase/testpilot", s"$outBase/testpilottest",
        s"$outBase/search"))
    spark.stop()
  }

  /** Output locations: two day-partitioned tables and one single-file
    * table (testpilot_data.py:197-200 — `partitions=16*5` there is a
    * file-count choice; partition-by-day is the idiomatic upgrade that
    * also bounds daily-rerun rewrite scope via dynamic overwrite). */
  final case class Sinks(testpilot: String, testpilottest: String,
                         search: String)

  /** Doc-type "testpilot" (testpilot_data.py:118-138): interaction events
    * with JSON prop extraction, ping_filter + post-projection filter. */
  def testpilotConfig: FrameConfig = FrameConfig(
    columns = Seq(
      ColumnSpec("event_id", col("event_id")),
      ColumnSpec("day", date_format(col("ts"), "yyyy-MM-dd")),
      ColumnSpec("user_id", col("user_id")),
      ColumnSpec("event", col("event_type")),
      ColumnSpec("prop_k", get_json_object(col("props"), "$.k"),
        castTo = Some(LongType))),
    preFilter = Some(col("event_type").isin("click", "view")),
    postFilter = Some(col("prop_k").isNotNull))

  /** Doc-type "testpilottest" (testpilot_data.py:141-167): the remaining
    * events with a fixed-point money cast (round BEFORE the long cast —
    * engines disagree on double→int rounding otherwise). */
  def testpilottestConfig: FrameConfig = FrameConfig(
    columns = Seq(
      ColumnSpec("event_id", col("event_id")),
      ColumnSpec("day", date_format(col("ts"), "yyyy-MM-dd")),
      ColumnSpec("user_id", col("user_id")),
      ColumnSpec("event", col("event_type")),
      ColumnSpec("value_cents", round(col("value") * 100),
        castTo = Some(LongType))),
    preFilter = Some(!col("event_type").isin("click", "view")))

  /** CSV source "search" (testpilot_data.py:170-195): header CSV arrives
    * all-strings; per-cell cleaning funcs become Column combinators. */
  def searchConfig: FrameConfig = FrameConfig(
    columns = Seq(
      ColumnSpec("cust_id", col("c_custkey"), castTo = Some(LongType)),
      ColumnSpec("name_prefix", col("c_name"), clean = Clean.splitHead("#")),
      ColumnSpec("is_auto", col("c_mktsegment"),
        clean = Clean.memberOf("AUTOMOBILE", "MACHINERY")),
      ColumnSpec("balance_cents", col("c_acctbal"),
        clean = c => round(c.cast("double") * 100),
        castTo = Some(LongType))))

  /** Run the daily job: project the three frames (ONE shared telemetry
    * scan feeds both doc-type configs) and, when `save`, write all three
    * sinks. Returns (testpilot, testpilottest, search) like the
    * reference's `main`. */
  def run(spark: SparkSession, telemetry: DataFrame, searchCsv: DataFrame,
          sinks: Sinks, save: Boolean = true)
      : (DataFrame, DataFrame, DataFrame) = {
    val testpilot = testpilotConfig(telemetry)
    val testpilottest = testpilottestConfig(telemetry)
    val search = searchConfig(searchCsv)
    if (save) {
      PartitionedWriter.write(testpilot, sinks.testpilot,
        partitionCols = Seq("day"))
      PartitionedWriter.write(testpilottest, sinks.testpilottest,
        partitionCols = Seq("day"))
      PartitionedWriter.write(search, sinks.search, numFiles = Some(1))
    }
    (testpilot, testpilottest, search)
  }
}
