package graft.io

import org.apache.spark.sql.DataFrame

/** Date-partitioned parquet sink — reference K1/K2 (`save_df`,
  * /root/reference/cliqz_etl/testpilot_data.py:72-82: overwrite +
  * `repartition(n)` + path-string partition `submission=<day>`).
  *
  * Idiomatic upgrade (SURVEY.md §2.1/K1): use `partitionBy` so the partition
  * column is managed by the writer and surfaces as a readable column on scan
  * (the behavior profile_daily.py:28,38 silently depends on). At 100 TB the
  * partition column (a date) bounds rewrite scope via dynamic partition
  * overwrite instead of whole-table overwrite.
  */
object PartitionedWriter {
  def write(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String] = Nil,
      numFiles: Option[Int] = None): Unit = {
    // Control output file count like the reference's repartition(1|80)
    // (testpilot_data.py:82,198-200); when unset, let AQE coalesce.
    val sized = numFiles.fold(df)(n => df.repartition(n))
    val writer = sized.write.mode("overwrite")
    val parted =
      if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
      else writer
    parted.parquet(path)
  }
}
