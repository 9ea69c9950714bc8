package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Measures [[graft.llm.Dedup.bloomDecontamination]] at its DESIGN POINT —
  * a huge corpus checked against a small, mostly-shingle-disjoint
  * benchmark (the web-corpus-vs-eval-suite asymmetry) — against the plain
  * exact path on the same inputs.
  *
  * The per-round gate cannot exhibit this regime: its benchmark is a 10%
  * hash bucket of the SAME corpus, so nearly every corpus doc shares
  * shingles with the benchmark and the Bloom prune keeps almost
  * everything (measured ~parity with q91 at 1× and 100×). Here the
  * benchmark is a DIFFERENT documents table (e.g. sf0.001 vs the 100×
  * scale corpus, whose replicas 1..99 use disjoint vocabularies), so the
  * prune rate approaches the design point's.
  *
  * Prints, per run: candidate-survivor count, total corpus count, and
  * wall seconds for bloom vs exact.
  *
  * `runMain graft.tools.BloomProbe <corpusDocsDir> <benchDocsDir> <runs>`
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val benchDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
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
    graft.GraftFunctions.register(spark)

    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
    val bench = spark.read.parquet(s"$benchDir/documents.parquet")
      // avoid doc_id collisions between the two tables: benchmark ids
      // move to a disjoint negative range (side semantics unaffected)
      .withColumn("doc_id", -col("doc_id") - 1)
    println(s"[bloomprobe] corpus=${corpus.count()} bench=${bench.count()}")

    // true shingle-sharing survivor count (the Bloom admits >= this,
    // + false positives at the configured fpp): the prune-rate stat
    import graft.llm.TextAnalysis
    val bsh = bench.select(explode(TextAnalysis.hashedShinglesFromTokens(
      TextAnalysis.tokens(col("text")), 3)).as("sg")).distinct()
    val sharing = corpus
      .select(col("doc_id"), explode(TextAnalysis.hashedShinglesFromTokens(
        TextAnalysis.tokens(col("text")), 3)).as("sg"))
      .join(bsh, Seq("sg"), "left_semi")
      .select("doc_id").distinct().count()
    println(s"[bloomprobe] shingle-sharing corpus docs=$sharing")

    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    (0 until runs).foreach { r =>
      spark.catalog.clearCache()
      val (nb, tb) = time {
        Dedup.bloomDecontamination(corpus, bench, n = 3, threshold = 0.5)
          .count()
      }
      spark.catalog.clearCache()
      val (ne, te) = time {
        Dedup.crossContamination(corpus, bench, n = 3, threshold = 0.5,
          route = Dedup.ExactRoute).count()
      }
      require(nb == ne, s"bloom path changed the answer: $nb vs $ne")
      println(f"[bloomprobe] run=$r hits=$nb bloom=$tb%.1fs exact=$te%.1fs")
    }
    spark.stop()
  }
}
