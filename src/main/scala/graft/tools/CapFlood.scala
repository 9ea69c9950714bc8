package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** The cap-validation experiment for `Dedup.containmentPairs`'s
  * count-filter candidate join (VERDICT r5 ask #1): a shingle with
  * document frequency df contributes df² join rows ON ONE KEY, so the
  * `maxDf` default is a claim about how much single-key work a reducer
  * can absorb — a claim that had never been measured.
  *
  * `runMain graft.tools.CapFlood <nFiller> <hotDfs...>`
  *
  * Corpus construction (all in-memory via spark.range, deterministic):
  *  - `nFiller` background docs of 8 unique tokens each (6 unique
  *    shingles/doc — no cross-doc sharing);
  *  - for each run, `hotDf` of those docs get one shared HOT trigram
  *    appended (df(hot) = hotDf exactly; its 2 flanking shingles stay
  *    unique per doc);
  *  - 2 planted rare-shingle docs where the short one is fully contained
  *    in the long one (the pair every run must emit exactly).
  *
  * Per hotDf, the tool times `Dedup.containmentPairs` twice:
  *  1. cap ABOVE hotDf (hot shingle participates): measures the df² join
  *     honestly — candidate-pair row count printed is hotDf·(hotDf-1)/2;
  *  2. cap BELOW hotDf (cap active): the hot shingle leaves candidate
  *     generation, the flood collapses, and the planted pair must still
  *     be emitted with containment 1.0 — the recall contract of the
  *     allowance bound at scale.
  *
  * The measured curve (see BASELINE.md round-6) is what sets the shipped
  * `maxDf` default: single-key join work is df²/2 rows through one
  * 32-thread stage here and one reducer (modulo AQE skew split) on a
  * cluster.
  */
object CapFlood {
  def main(args: Array[String]): Unit = {
    val nFiller = if (args.nonEmpty) args(0).toLong else 500000L
    val hotDfs = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                 else Seq(1024, 4096, 16384)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[capflood] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def corpus(hotDf: Int): DataFrame = {
      val filler = spark.range(nFiller).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 8).map(j =>
          concat(lit(s"u${j}_"), col("id"))): _*).as("text"))
      val flood = filler.withColumn("text",
        when(col("doc_id") < hotDf,
          concat(col("text"), lit(" HOTA HOTB HOTC")))
          .otherwise(col("text")))
      val planted = spark.range(1).select(
        col("id"), lit("ra rb rc rd re rf").as("short"),
        lit("px py ra rb rc rd re rf pz pw").as("long"))
      val plantedDocs = planted.select(
        (lit(nFiller) + 1).as("doc_id"), col("short").as("text"))
        .union(planted.select(
          (lit(nFiller) + 2).as("doc_id"), col("long").as("text")))
      flood.unionByName(plantedDocs)
    }

    hotDfs.foreach { hotDf =>
      val docs = corpus(hotDf).localCheckpoint() // corpus build off the clock
      println(s"[capflood] === hotDf=$hotDf docs=${docs.count()} ===")
      // run 1: cap above hotDf — the hot shingle's df² join measured live
      val open = time(s"cap OPEN  (maxDf=${hotDf * 2}), df^2 join runs") {
        Dedup.containmentPairs(docs, n = 3, threshold = 0.9,
          maxDf = hotDf * 2).collect()
      }
      println(s"[capflood]   open pairs=${open.length} " +
        s"(df^2/2 candidate rows ~ ${hotDf.toLong * (hotDf - 1) / 2})")
      // run 2: cap below hotDf — flood pruned, planted pair exact
      val capped = time(s"cap ACTIVE (maxDf=${hotDf / 2}), flood pruned") {
        Dedup.containmentPairs(docs, n = 3, threshold = 0.9,
          maxDf = hotDf / 2).collect()
      }
      val plantedPair = capped.find(r =>
        r.getLong(0) == nFiller + 1 && r.getLong(1) == nFiller + 2)
      println(s"[capflood]   capped pairs=${capped.length} planted=" +
        plantedPair.map(_.getDouble(2)).getOrElse(Double.NaN))
      assert(plantedPair.exists(_.getDouble(2) == 1.0),
        "planted contained pair must survive the cap with exact value")
      docs.unpersist()
    }
    spark.stop()
  }
}
