package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, XxSeededHash}

/** The cap-validation experiment for `Dedup.minHashLsh`'s `maxBucket`
  * guard (`dropHotBuckets` — also the SimHash band joins): a band bucket
  * of size s generates s·(s-1)/2 candidate rows ON ONE (band, bucket)
  * KEY. The 2^12 default previously inherited CapFlood's df² curve by
  * shape-analogy; this tool measures the HOT-BUCKET flood directly.
  *
  * `runMain graft.tools.BucketFlood <nFiller> <floodSizes...> [open|capped|both]`
  *
  * Corpus construction (in-memory, deterministic):
  *  - `nFiller` background docs of 8 unique tokens each — unique
  *    signatures, singleton buckets;
  *  - a flood of `floodSize` docs with IDENTICAL text: identical MinHash
  *    signatures, so ALL `bands` buckets are over-cap — the template
  *    flood the guard exists for (every flood pair collides in every
  *    band: 4·s²/2 candidate rows, collapsing to s²/2 distinct pairs);
  *  - 2 planted docs with IDENTICAL text, distinct from the flood: their
  *    2-doc buckets sit far below the cap, so every capped run must
  *    still emit the pair (deterministically — identical signatures
  *    collide in every band regardless of hash family; a merely-similar
  *    pair's band collision would be a fixed but family-dependent coin
  *    flip).
  *
  * Per floodSize, times `minHashLsh` (xx64 family — the production
  * path) with the guard OPEN (maxBucket above floodSize; `count()`
  * materialization — the emitted flood pairs are the measurement, not
  * driver fodder) and ACTIVE (4096 default; planted pair asserted).
  */
object BucketFlood {
  def main(args: Array[String]): Unit = {
    val nFiller = if (args.nonEmpty) args(0).toLong else 500000L
    val floodSizes = if (args.length > 1)
      args.drop(1).filterNot(Set("open", "capped", "both")).map(_.toInt).toSeq
      else Seq(8192)
    val mode = args.find(Set("open", "capped", "both")).getOrElse("both")
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
      println(f"[bucketflood] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def corpus(floodSize: Int): DataFrame = {
      val filler = spark.range(nFiller).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 8).map(j =>
          concat(lit(s"u${j}_"), col("id"))): _*).as("text"))
      val flood = spark.range(floodSize).select(
        (col("id") + nFiller).as("doc_id"),
        lit("tpl t1 t2 t3 t4 t5 t6 t7 t8 t9").as("text"))
      val plantedDocs = spark.range(2).select(
        (col("id") + nFiller + floodSize).as("doc_id"),
        lit("pa pb pc pd pe pf pg ph pi pj").as("text"))
      filler.unionByName(flood).unionByName(plantedDocs)
    }

    floodSizes.foreach { floodSize =>
      val docs = corpus(floodSize).localCheckpoint()
      val pa = nFiller + floodSize
      val pb = pa + 1
      println(s"[bucketflood] === flood=$floodSize docs=${docs.count()} ===")
      if (mode != "capped") {
        val open = time(s"cap OPEN  (maxBucket=${floodSize * 2}), s^2 joins") {
          Dedup.minHashLsh(docs, hasher = XxSeededHash,
            maxBucket = floodSize * 2).count()
        }
        println(s"[bucketflood]   open pairs=$open " +
          s"(flood pairs ~ ${floodSize.toLong * (floodSize - 1) / 2}, " +
          s"x4 bands of single-key join rows)")
      }
      if (mode != "open") {
        val capped = time(s"cap ACTIVE (maxBucket=4096), flood dropped") {
          Dedup.minHashLsh(docs, hasher = XxSeededHash,
            maxBucket = 1 << 12).collect()
        }
        val plantedPair = capped.find(r =>
          r.getLong(0) == pa && r.getLong(1) == pb)
        println(s"[bucketflood]   capped pairs=${capped.length} planted=" +
          plantedPair.map(_.getDouble(2)).getOrElse(Double.NaN))
        assert(plantedPair.isDefined,
          "planted near-dup pair must survive the cap")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
