package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The merge-on-read value proposition, measured head-to-head:
  * `runMain graft.tools.MorContrast <sfDir>` stages the documents
  * corpus as a snapshot table, then times a POINT DELETE (one doc_id,
  * one row) under copy-on-write vs merge-on-read, the full-scan
  * aggregate read before/after (the MoR read tax on a dirty table),
  * and the compaction that folds the tombstones. Prints one JSON line
  * per measurement. CoW pays a rewrite of every touched FILE for a
  * one-row change; MoR pays one (file, pos) sidecar row — the gap is
  * the point of deletion vectors at 100 TB. */
object MorContrast {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"metric":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    val st = graft.io.SnapshotTable
    def stage(name: String): String = {
      val d = java.nio.file.Files.createTempDirectory(name).toString
      st.commitMultiStats(spark, docs.repartition(16), d,
        statsCols = Seq("doc_id"))
      d
    }
    def scanAgg(d: String): Long =
      st.readSnapshot(spark, d).agg(sum(col("n_chars"))).head().getLong(0)

    // ---- copy-on-write point delete -------------------------------
    val cow = stage("mc-cow")
    t("cow_point_delete") { st.delete(spark, cow, col("doc_id") === 4242L) }
    t("cow_read_after") { scanAgg(cow) }

    // ---- merge-on-read point delete -------------------------------
    val mor = stage("mc-mor")
    st.enableMergeOnRead(mor)
    t("mor_point_delete") { st.delete(spark, mor, col("doc_id") === 4242L) }
    t("mor_read_dirty") { scanAgg(mor) }
    // 16 more point deletes — the accumulating-tombstones regime
    t("mor_16_more_deletes") {
      (0 until 16).foreach(i =>
        st.delete(spark, mor, col("doc_id") === (100L + i * 7L)))
    }
    t("mor_read_dirty_17") { scanAgg(mor) }
    t("mor_compact_fold") { st.compact(spark, mor, numFiles = 16) }
    t("mor_read_clean") { scanAgg(mor) }

    // parity witness: both tables answer identically after their DML
    // (the 16 extra MoR-deleted ids are filtered from BOTH reads)
    val extra = (0 until 16).map(i => 100L + i * 7L)
      .map(java.lang.Long.valueOf)
    def minusExtra(d: String): Long =
      st.readSnapshot(spark, d).where(!col("doc_id").isin(extra: _*))
        .agg(sum(col("n_chars"))).head().getLong(0)
    val a = minusExtra(cow)
    val b = minusExtra(mor)
    println(s"""{"metric":"parity","cow":$a,"mor":$b,"equal":${a == b}}""")
    spark.stop()
  }
}
