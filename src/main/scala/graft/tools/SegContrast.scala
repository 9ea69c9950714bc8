package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The segmented-manifest value proposition, measured:
  * `runMain graft.tools.SegContrast [nFiles]` builds a snapshot table
  * with ~nFiles data files (default 1000), then runs 20 single-file
  * appends and reports the commit METADATA bytes each one wrote —
  * O(delta) list+segment vs the O(table) full manifest every commit
  * used to rewrite. Prints one JSON line per measurement. */
object SegContrast {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val st = graft.io.SnapshotTable
    val dir = java.nio.file.Files.createTempDirectory("segc").toString
    // one wide write -> ~nFiles files in a single job
    st.commitMultiStats(spark,
      spark.range(0, nFiles.toLong * 50).select($"id", ($"id" * 3).as("n"))
        .repartition(nFiles), dir, statsCols = Seq("id"))
    def logBytes(): Long = {
      def walk(f: java.io.File): Long = {
        val kids = Option(f.listFiles()).getOrElse(Array.empty)
        kids.map(k => if (k.isDirectory) walk(k) else k.length()).sum
      }
      walk(new java.io.File(dir, "_log"))
    }
    val v1Manifest = new java.io.File(dir,
      "_log/v00001.json").length()
    println(s"""{"metric":"base_files","value":${
      st.manifestFiles(dir, 1).length}}""")
    println(s"""{"metric":"full_manifest_bytes","value":$v1Manifest}""")
    var prev = logBytes()
    val perAppend = (0 until 20).map { i =>
      st.commitMultiStats(spark,
        Seq((1000000L + i, i.toLong)).toDF("id", "n").coalesce(1), dir,
        statsCols = Seq("id"))
      val now = logBytes()
      val delta = now - prev
      prev = now
      delta
    }
    // first append pays the one-time prev-materialization; steady
    // state is list growth + one tiny segment
    println(s"""{"metric":"first_append_log_bytes","value":${
      perAppend.head}}""")
    println(s"""{"metric":"steady_append_log_bytes_median","value":${
      perAppend.tail.sorted.apply(perAppend.tail.length / 2)}}""")
    println(s"""{"metric":"full_rewrite_would_cost","value":${
      v1Manifest} ,"note":"bytes EVERY append used to rewrite"}""")
    // correctness spot-check: the 21-version table still answers
    val n = st.readSnapshot(spark, dir).count()
    println(s"""{"metric":"rows","value":$n,"expected":${
      nFiles.toLong * 50 + 20}}""")
    spark.stop()
  }
}
