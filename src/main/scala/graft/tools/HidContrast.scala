package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The hidden-partitioning value proposition, measured head-to-head:
  * `runMain graft.tools.HidContrast <docsDir>` stages the documents
  * corpus twice — FLAT (unpartitioned, stats on doc_id) and
  * HIDDEN-partitioned by `truncate(100000, doc_id)` (the "one cell
  * per ingest day" shape: the 100x ScaleUp corpus offsets each copy
  * by 100000, so cells are exactly the copies) — then times the same
  * one-cell range aggregate on both, plus the DSv2 planned-file
  * counts. Flat pays whatever min/max file stats happen to give on
  * an unordered layout (typically the full scan); the transform
  * table plans ONE cell's files from manifest bytes. Also times
  * `deletePartitions` of one cell (a metadata commit) vs the
  * copy-on-write delete of the same range on the flat table. Prints
  * one JSON line per measurement. */
object HidContrast {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"metric":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    val st = graft.io.SnapshotTable
    val flat = java.nio.file.Files.createTempDirectory("hc-flat").toString
    t("stage_flat") {
      st.commitMultiStats(spark, docs.repartition(16), flat,
        statsCols = Seq("doc_id"))
    }
    val hid = java.nio.file.Files.createTempDirectory("hc-hid").toString
    t("stage_hidden") {
      // cluster by the cell value first so each cell lands ~one file
      // (the layout a real ingest produces: one day = one batch)
      st.commitPartitionedTransforms(spark,
        docs.repartition(100,
          col("doc_id") - pmod(col("doc_id"), lit(100000L))), hid,
        Seq(graft.io.PartTransform.Trunc("doc_id", 100000L)))
    }
    def load(d: String) =
      spark.read.format("graft.sources.SnapshotSource").load(d)
    def cellAgg(d: String): (Long, Long) = {
      val r = load(d)
        .where(col("doc_id") >= 3000000L && col("doc_id") < 3100000L)
        .agg(count(lit(1)), sum(col("n_chars"))).head()
      (r.getLong(0), r.getLong(1))
    }
    def planned(d: String): Int = {
      val df = load(d)
        .where(col("doc_id") >= 3000000L && col("doc_id") < 3100000L)
      df.count() // execute so AQE finalizes
      """files=(\d+)""".r.findFirstMatchIn(
        df.queryExecution.executedPlan.collectLeaves()
          .map(_.toString).mkString).map(_.group(1).toInt).getOrElse(-1)
    }
    def total(d: String): Int =
      st.manifestFiles(d, st.versions(d).last).length
    println(s"""{"metric":"flat_files_planned","n":${planned(flat)},""" +
      s""""total":${total(flat)}}""")
    println(s"""{"metric":"hidden_files_planned","n":${planned(hid)},""" +
      s""""total":${total(hid)}}""")
    var a = (0L, 0L); var b = (0L, 0L)
    (1 to 3).foreach { i =>
      a = t(s"flat_cell_agg_$i") { cellAgg(flat) }
      b = t(s"hidden_cell_agg_$i") { cellAgg(hid) }
    }
    require(a == b, s"cell aggregates diverge: $a != $b")
    println(s"""{"metric":"cell_agg_equal","ok":true,"rows":${a._1}}""")
    // drop one ingest cell: metadata on the transform table, CoW scan
    // + rewrite on the flat one
    t("flat_cow_delete_cell") {
      st.delete(spark, flat,
        col("doc_id") >= 7000000L && col("doc_id") < 7100000L)
    }
    t("hidden_metadata_delete_cell") {
      st.deletePartitions(hid, Map("doc_id" -> "7000000"))
    }
    val na = load(flat).count(); val nb = load(hid).count()
    require(na == nb, s"post-delete counts diverge: $na != $nb")
    println(s"""{"metric":"post_delete_equal","ok":true,"rows":$na}""")
    spark.stop()
  }
}
