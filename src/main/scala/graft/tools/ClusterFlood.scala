package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** The cap-validation experiment for `Similarity.semanticDedup`'s
  * `maxCluster` guard — the CapFlood playbook on the k-means-cell shape:
  * a cell of size s generates s·(s-1)/2 within-cell cosine pairs ON ONE
  * cid KEY, so the `maxCluster` default is a claim about how much
  * single-key join work a reducer can absorb.
  *
  * `runMain graft.tools.ClusterFlood <nFiller> <floodSizes...> [open|capped|both]`
  *
  * Corpus construction (in-memory, deterministic):
  *  - `nFiller` background vectors: 8 dims derived from xxhash64(id, d) —
  *    spread across cells, no structural duplication;
  *  - a flood of `floodSize` IDENTICAL vectors: k-means cannot split an
  *    identical-vector cell (all seeds tie), so every refinement level
  *    fails and the guard's terminal drop is exercised — the exact
  *    degenerate `clusterCapped`'s maxDepth drop exists for;
  *  - 2 planted DUPLICATES of filler id 7's exact vector: identical
  *    vectors take identical nearest-centroid assignments, so the pair
  *    provably co-cells in filler 7's under-cap cell and every capped
  *    run must resolve {7, pa, pb} into one component. Two rejected
  *    constructions measured real sensitivities instead of the guard:
  *    a direction unaligned with everything was assigned to the FLOOD's
  *    cell — re-seeding cannot split an identical-vector cell, and the
  *    maxDepth drop took the planted pair with it (the cell-granular
  *    recall trade `semanticDedup`'s scaladoc prices; recorded in
  *    BASELINE.md) — and filler 7 ± 0.001/dim straddled a cell boundary,
  *    its two halves landing in different cells.
  *
  * Per floodSize, times `semanticDedup` (k chosen so FILLER cells sit
  * well under the cap) twice:
  *  1. guard OPEN (`maxCluster` above floodSize): the flood cell's s²/2
  *     pairs — all cosine 1.0, so they flow into connectedComponents as
  *     an s-clique — measured honestly;
  *  2. guard ACTIVE (`maxCluster` = 4096 default): the flood re-clusters
  *     `maxDepth` times, fails to split, is dropped; the planted pair
  *     must still come back clustered.
  */
object ClusterFlood {
  def main(args: Array[String]): Unit = {
    val nFiller = if (args.nonEmpty) args(0).toLong else 20000L
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
      println(f"[clusterflood] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 16 dims + threshold 0.9 below: random filler pairs essentially
    // never pass the similarity threshold, so the CC input is the flood
    // clique (open) or just the planted pair (capped) — the delta
    // between the two walls is the guard's effect, not filler noise
    val dims = 16
    def corpus(floodSize: Int): DataFrame = {
      // filler: pseudo-random unit-ish vectors, deterministic per (id, d)
      val filler = spark.range(nFiller).select(
        col("id").as("vec_id"),
        array((0 until dims).map(d =>
          (pmod(xxhash64(col("id"), lit(d)), lit(1000L)).cast("float") / 500f
            - 1f)): _*).as("embedding"))
      // flood: one identical vector, unsplittable by construction
      val flood = spark.range(floodSize).select(
        (col("id") + nFiller).as("vec_id"),
        array((0 until dims).map(d => lit(0.1f * (d + 1))): _*)
          .as("embedding"))
      // planted pair: BOTH copies of filler id 7's exact vector — identical
      // vectors take identical nearest-centroid assignments, so the pair
      // provably co-cells in an under-cap filler cell (a ±0.001 offset
      // version straddled a cell boundary and the two halves landed in
      // different cells — cell-boundary sensitivity, not a guard effect)
      val planted = spark.range(2).select(
        (col("id") + nFiller + floodSize).as("vec_id"),
        array((0 until dims).map(d =>
          pmod(xxhash64(lit(7L), lit(d)), lit(1000L)).cast("float") / 500f
            - 1f): _*).as("embedding"))
      filler.unionByName(flood).unionByName(planted)
    }

    floodSizes.foreach { floodSize =>
      val docs = corpus(floodSize).localCheckpoint() // corpus build off the clock
      val pa = nFiller + floodSize
      val pb = pa + 1
      // k sized so filler cells sit ~Σc²-cheap and well under the cap
      val k = math.max(8, (nFiller / 1000).toInt)
      println(s"[clusterflood] === flood=$floodSize docs=${docs.count()} k=$k ===")
      if (mode != "capped") {
        val open = time(s"guard OPEN  (maxCluster=${floodSize * 2}), s^2 clique") {
          Similarity.semanticDedup(docs, k = k, threshold = 0.9,
            maxCluster = floodSize * 2).count()
        }
        println(s"[clusterflood]   open rows=$open " +
          s"(flood clique pairs ~ ${floodSize.toLong * (floodSize - 1) / 2})")
      }
      if (mode != "open") {
        val capped = time(s"guard ACTIVE (maxCluster=4096), flood dropped") {
          Similarity.semanticDedup(docs, k = k, threshold = 0.9,
            maxCluster = 1 << 12).collect()
        }
        val plantedRows = capped.filter(r =>
          r.getLong(0) == pa || r.getLong(0) == pb)
        println(s"[clusterflood]   capped rows=${capped.length} planted=" +
          plantedRows.map(r => s"${r.getLong(0)}->${r.getLong(1)}")
            .mkString(","))
        assert(plantedRows.length == 2 &&
          plantedRows.map(_.getLong(1)).distinct.length == 1,
          "planted near-identical pair must survive the cap in one component")
        assert(!capped.exists(r => r.getLong(0) >= nFiller && r.getLong(0) < pa),
          "flood members must be dropped, not half-resolved")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
