package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.llm.TextAnalysis

/** Ad-hoc stage timer for the containment family (q72/q91 tuning). */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (round <- 1 to 2) {
      println(s"[prof] --- round $round ---")
      spark.catalog.clearCache()
      val sh = docs
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          TextAnalysis.hashedShinglesFromTokens(col("toks"), 3).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("shingles materialize")(sh.count())
      val ex = sh.select(col("doc_id"), explode(col("sh")).as("sg"))
      val freq = ex.groupBy("sg").agg(count(lit(1)).as("df"))
      time("freq groupBy")(freq.write.format("noop").mode("overwrite").save())
      val inter = ex.as("a").join(ex.as("b"),
          col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter_lb"))
      time("inter self-join+groupBy")(
        inter.write.format("noop").mode("overwrite").save())
      val meta = sh.select(col("doc_id"), size(col("sh")).cast("long").as("sz"))
      val cand = inter
        .join(meta.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
        .join(meta.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
        .where(col("inter_lb").cast("double") >=
          least(col("sz_a"), col("sz_b")) * 0.5)
        .select("doc_a", "doc_b")
      val nCand = time("cand (inter+meta filter)")(cand.count())
      println(s"[prof] candidates: $nCand")
      val verified = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("inter", org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.SortedIntersectCount(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("sh_a")),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("sh_b")))))
        .withColumn("containment", col("inter").cast("double") /
          least(size(col("sh_a")), size(col("sh_b"))).cast("double"))
        .where(col("containment") >= 0.5)
      time("verify joins")(
        verified.write.format("noop").mode("overwrite").save())
      time("full q72 query")(
        graft.SparkEntry.queries("q72_containment")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      sh.unpersist()
    }
    spark.stop()
  }
}
