package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextAnalysis}

/** Prints the [[graft.llm.Dedup.postingsMeanDf]] routing statistic
  * (Σdf²/Σdf over below-cap trigram shingles) for each documents.parquet
  * dir given — the calibration tool behind [[Dedup.AutoRoute]]'s
  * `sketchMeanDf` default: run it on the BASELINE.md round-6 corpora
  * (where the exact-vs-sketch crossover was measured directly) and put
  * the threshold between the two regimes.
  *
  * `runMain graft.tools.DfStat <docsDir>...`
  */
object DfStat {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val freq = docs
        .select(explode(TextAnalysis.hashedShinglesFromTokens(
          TextAnalysis.tokens(col("text")), 3)).as("sg"))
        .groupBy("sg").agg(count(lit(1)).as("df"))
      val stat = Dedup.postingsMeanDf(freq, maxDf = 1 << 12)
      println(f"[dfstat] $dir meanDf=$stat%.2f")
    }
    spark.stop()
  }
}
