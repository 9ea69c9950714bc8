package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ANN quality: LSH-bucketed search vs the exact brute-force baseline. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")

  test("brute-force top-k is exact and deterministic") {
    val q = emb.where(col("vec_id") < 5)
    val a = Similarity.bruteForceTopK(q, emb, 3)
      .select("query_id", "rn", "neighbor_id").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    val b = Similarity.bruteForceTopK(q, emb, 3)
      .select("query_id", "rn", "neighbor_id").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    assert(a == b)
    assert(a.size == 15) // 5 queries x top-3
  }

  test("IVF top-k scores agree with brute force and recall is reasonable") {
    val q = emb.where(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    val bruteMap = brute.map { case (a, b, s) => (a, b) -> s }.toMap
    val ivf = Similarity.ivfTopK(q, emb, 5)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (a, b, s) =>
      bruteMap.get((a, b)).foreach(bs => assert(math.abs(bs - s) < 1e-12))
    }
    // every query that probed a non-empty cell returns something
    val perQuery = ivf.groupBy(_._1)
    assert(perQuery.size >= 10)
  }

  test("kmeans assignment is total, bounded by k, and deterministic") {
    val a = Similarity.kmeansAssign(emb, k = 4, iters = 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().sorted.toSeq
    val b = Similarity.kmeansAssign(emb, k = 4, iters = 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b) // deterministic across runs (no rand, hash seeds)
    assert(a.map(_._1).distinct.size == emb.count()) // one row per vector
    val cids = a.map(_._2).toSet
    assert(cids.size <= 4 && cids.size >= 2)
    val corpusIds = emb.select("vec_id").as[Long].collect().toSet
    assert(cids.subsetOf(corpusIds)) // cids are seed vec_ids
  }

  test("clusterSeparation: sizes partition the corpus, margins nonneg, " +
      "consistent with kmeansAssign") {
    val rep = Similarity.clusterSeparation(emb, k = 4, iters = 2)
      .as[(Long, Long, Double, Long, Double, Long)].collect().toList
    // cluster sizes partition the corpus
    assert(rep.map(_._2).sum == emb.count())
    // own centroid is rank-1 ⇒ margin to the runner-up is never negative
    rep.foreach { case (cid, n, meanM, minM, meanOwn, minOwn) =>
      assert(minM >= 0L, s"cid $cid")
      assert(meanM >= minM.toDouble && meanOwn >= minOwn.toDouble)
      assert(n > 0)
    }
    // the report's clusters and sizes agree with the assignment frame
    val sizes = Similarity.kmeansAssign(emb, k = 4, iters = 2)
      .groupBy("cid").count()
      .as[(Long, Long)].collect().toMap
    assert(rep.map(r => r._1 -> r._2).toMap == sizes)
  }

  test("lshBucketAudit: histogram identities and the minimal-planes law") {
    val n = emb.count()
    val rep = Similarity.lshBucketAudit(emb, tables = 4, planesPerTable = 8,
        targetBucket = 16)
      .as[(Long, Long, Long, Long, Double, Long, Long, Long)]
      .collect().toList
    assert(rep.map(_._1) == List(0L, 1L, 2L, 3L))
    rep.foreach { case (t, nv, nb, mx, mean, s2, cp, p) =>
      assert(nv == n, s"table $t signs every vector")
      assert(mx <= nv && nb <= nv)
      // pair arithmetic: Σ sz(sz−1)/2 == (Σ sz² − Σ sz) / 2
      assert(cp == (s2 - nv) / 2)
      assert(mean == math.rint(nv.toDouble / nb * 10000) / 10000)
      // minimal p with (n−1) >> p < target
      assert((nv - 1) >> p < 16)
      assert(p == 0 || (nv - 1) >> (p - 1) >= 16)
    }
  }

  test("lshBucketAudit flags a planted flood as one full bucket") {
    val flood = (0L until 64L)
      .map(i => (i, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val rep = Similarity.lshBucketAudit(flood, tables = 2,
        planesPerTable = 4, targetBucket = 4)
      .as[(Long, Long, Long, Long, Double, Long, Long, Long)]
      .collect().toList
    rep.foreach { case (_, nv, nb, mx, _, s2, cp, _) =>
      assert(nv == 64 && nb == 1 && mx == 64) // identical vectors collide
      assert(s2 == 64L * 64L && cp == 64L * 63L / 2)
    }
  }

  test("trained-IVF recall >= hash-sample-IVF recall vs brute force") {
    val q = emb.where(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(ann: Set[(Long, Long)]): Double =
      brute.count(ann.contains).toDouble / brute.size
    val hashSample = Similarity.ivfTopK(q, emb, 5, numCentroids = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val trained = Similarity.ivfTopKTrained(q, emb, 5, numCentroids = 8,
        iters = 2, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(trained.nonEmpty)
    // fitted centroids track corpus density: same probe budget, at least
    // as many true neighbors recovered as the zero-training hash sample
    assert(recall(trained) >= recall(hashSample),
      s"trained=${recall(trained)} hash=${recall(hashSample)}")
  }

  test("LSH candidates score identically to brute force for same pairs") {
    val q = emb.where(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val lsh = Similarity.lshTopK(q, emb, 5)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    // any LSH hit that brute force also ranked must agree on the score
    lsh.foreach { case (a, b, s) =>
      brute.get((a, b)).foreach(bs => assert(math.abs(bs - s) < 1e-12))
    }
  }

  test("semantic dedup resolves planted paraphrase pairs to min-id keepers") {
    // two tight semantic pairs on orthogonal axes: whatever the k=2
    // clustering does, each pair lands in ONE cluster (near-identical
    // vectors), the cross pairs score ~0 < threshold, so the components
    // are exactly {0,1} and {2,3} with min-id keepers
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.01f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.98f, 0.2f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, k = 2, iters = 2,
        threshold = 0.95)
      .select("vec_id", "component", "is_keeper")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((0L, 0L, true), (1L, 0L, false),
      (2L, 2L, true), (3L, 2L, false)))
  }

  test("maxCluster guard is identity below the cap") {
    def run(cap: Int) = Similarity.semanticDedup(emb, k = 4, iters = 2,
        threshold = 0.4, maxCluster = cap)
      .select("vec_id", "component", "is_keeper")
      .as[(Long, Long, Boolean)].collect().toSet
    // sf0.001 cluster sizes are far below the default cap: guarded ==
    // unguarded, and the guard's size probe is the only extra work
    assert(run(1 << 12) == run(Int.MaxValue))
  }

  test("maxCluster guard drops an unsplittable identical-vector flood") {
    // 40 identical vectors: every k-means seed ties, so no refinement
    // level can split the cell — after maxDepth the flood is DROPPED
    // (the dropHotBuckets trade; exact dedup is the right tool for it)
    val flood = (0L until 40L).map(i => (i, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cells = Similarity.clusterCapped(flood, k = 2, iters = 2,
      XxSeededHash, maxCluster = 8)
    assert(cells.isEmpty)
    assert(Similarity.semanticDedup(flood, k = 2, iters = 2,
      threshold = 0.9, maxCluster = 8).isEmpty)
  }

  test("maxCluster guard: every surviving cell is at or below the cap") {
    // three orthogonal identical-vector blobs; k=2 must co-cell at least
    // two of them, tripping the cap; refinement either splits the merged
    // cell along the blob boundary or (same-blob seeds tie) drops it —
    // both outcomes satisfy the invariant the pair join depends on
    val blobs =
      (0L until 30L).map(i => (i, Array(1.0f, 0.0f, 0.0f))) ++
      (30L until 60L).map(i => (i, Array(0.0f, 1.0f, 0.0f))) ++
      (60L until 65L).map(i => (i, Array(0.0f, 0.0f, 1.0f)))
    val corpus = blobs.toDF("vec_id", "embedding")
    val cells = Similarity.clusterCapped(corpus, k = 2, iters = 2,
      XxSeededHash, maxCluster = 32)
    val sizes = cells.groupBy("cid").count()
      .select("count").as[Long].collect()
    assert(sizes.forall(_ <= 32), s"over-cap cell survived: ${sizes.toSeq}")
    // survivors are a subset of the corpus, each exactly once
    val ids = cells.select("vec_id").as[Long].collect()
    assert(ids.distinct.length == ids.length)
    assert(ids.toSet.subsetOf(blobs.map(_._1).toSet))
  }

  test("prototypicality prune: per-cluster fraction, most-central dropped") {
    val out = Similarity.prototypicalityPrune(emb, pruneFrac = 0.25)
      .select("vec_id", "cid", "centroid_sim", "kept")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out.size == emb.count()) // total: every vector scored
    out.groupBy(_._2).foreach { case (cid, members) =>
      val pruned = members.filterNot(_._4)
      // exactly ceil(0.25·|cluster|) pruned per cluster
      assert(pruned.size == math.ceil(members.size * 0.25).toLong,
        s"cid $cid: ${pruned.size} of ${members.size}")
      if (pruned.nonEmpty && pruned.size < members.size) {
        // the pruned set is the TOP of the (sim desc, vec_id asc) order
        val ordered = members.sortBy(m => (-m._3, m._1))
        assert(ordered.take(pruned.size).map(_._1).toSet ==
          pruned.map(_._1).toSet, s"cid $cid prune set not prefix")
      }
    }
    // pruneFrac 0 keeps everything
    val all = Similarity.prototypicalityPrune(emb, pruneFrac = 0.0)
      .where(!col("kept")).count()
    assert(all == 0L)
  }

  test("int8 quantization: codes in range, reconstruction within scale/2") {
    val qz = Similarity.quantizeInt8(emb)
    val bad = qz.where(exists(col("qvec"), v => v < 0 || v > 255)).count()
    assert(bad == 0L)
    // |x̂ - x| <= scale/2 per element (affine round-to-nearest bound)
    val err = Similarity.quantizeInt8(emb)
      .join(emb, "vec_id")
      .select(max(aggregate(
        zip_with(Similarity.dequantize(col("mn"), col("scale"), col("qvec")),
          col("embedding"),
          (xh, x) => abs(xh - x.cast("double")) / col("scale")),
        lit(0.0), (acc, v) => greatest(acc, v))))
      .as[Double].head()
    assert(err <= 0.5 + 1e-9, s"max relative err $err")
  }

  test("PQ: planted twin retrieved, deterministic, recall nonzero") {
    // an exact copy gets identical codes in every subspace, so its ADC
    // score against the original is the maximum any candidate can reach
    val twin = emb.where(col("vec_id") === 0)
      .select((col("vec_id") + 9000).as("vec_id"), col("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(twin)
    def run() = Similarity.pqTopK(corpus.where(col("vec_id") === 9000),
        corpus, k = 5)
      .select("rn", "neighbor_id").as[(Long, Long)].collect().toSeq.sorted
    val out = run()
    assert(out.map(_._2).contains(0L), s"twin missing from $out")
    assert(run() == out) // training + encoding + search all deterministic
    // coarse 12-bit codes still beat chance: some overlap with exact top-5
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert((exact intersect pq).nonEmpty)
  }

  test("quantized top-k recalls the exact top-k almost entirely") {
    val q = emb.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall") // 8-bit codes: near-exact
  }

  test("multi-table LSH recalls at least as much as single-table, nonzero") {
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val single = Similarity.lshTopK(q, emb, 5,
        hasher = PortableSeededHash)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val multi = Similarity.lshTopKMulti(q, emb, 5,
        hasher = PortableSeededHash)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rs = (exact intersect single).size
    val rm = (exact intersect multi).size
    assert(rm >= rs, s"multi-table recall $rm < single-table $rs")
    assert(rm > 0, "4 tables x 8 planes must collide some true neighbors")
  }

  test("annRecall report: one consistent row per leg, sq near-exact") {
    val rows = graft.queries.LlmQueries.annRecall(spark, Sf0001)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) ==
      Seq("graph", "ivf", "ivf_trained", "lsh", "lsh_multi", "pq", "sq"))
    rows.foreach { case (m, nRet, nHits, recall) =>
      assert(nHits >= 0 && nHits <= nRet, s"$m: hits $nHits > returned $nRet")
      assert(nRet <= 50, s"$m: returned $nRet > 10 queries x k=5")
      assert(recall >= 0.0 && recall <= 1.0, s"$m: recall $recall")
    }
    val byMethod = rows.map(r => r._1 -> r).toMap
    // sq is quantized BRUTE FORCE: always returns a full top-5 and the
    // 8-bit codes are near-exact (the recall >= 0.8 test above)
    assert(byMethod("sq")._2 == 50)
    assert(byMethod("sq")._4 >= 0.8)
  }

  test("knnGraph: ranked edges, correct mutual flags, cap is below-cap identity") {
    val g = Similarity.knnGraph(emb, k = 5, hasher = PortableSeededHash)
      .select("src", "rn", "dst", "sim", "mutual")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(g.nonEmpty)
    // per-src: rn is 1..n<=k, sims non-increasing in rank order
    g.groupBy(_._1).foreach { case (src, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to es.size.toLong), s"src $src ranks")
      assert(sorted.size <= 5, s"src $src has ${sorted.size} > k edges")
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => a._4 >= b._4; case _ => true }, s"src $src order")
    }
    // mutual flag = the transpose edge exists in the kept edge set
    val kept = g.map(e => (e._1, e._3)).toSet
    g.foreach { case (src, _, dst, _, mutual) =>
      assert(mutual == kept.contains((dst, src)), s"edge $src->$dst")
    }
    assert(g.exists(_._5) && g.exists(!_._5),
      "expect both mutual and one-way edges at this SF")
    // no bucket is near the 2^12 cap at this SF: capped == uncapped
    val unc = Similarity.knnGraph(emb, k = 5, maxBucket = Int.MaxValue,
        hasher = PortableSeededHash)
      .select("src", "rn", "dst", "sim", "mutual")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(g.toSet == unc.toSet)
  }

  test("q142: persisted IVF index — bit-identical search + partition-pruned probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    Similarity.writeIvfIndex(emb, dir, numCentroids = 8, iters = 2,
      hasher = PortableSeededHash)
    // layout: one partition directory per inverted list
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("cid=")).toSeq
    assert(cellDirs.nonEmpty && cellDirs.size <= 8)
    val q = emb.where(col("vec_id") < 10)
    val fromIndex = Similarity.ivfSearchIndexed(dir, q, k = 5)
    val inQuery = Similarity.ivfTopKTrained(q, emb, 5,
      hasher = PortableSeededHash)
    val a = fromIndex.select("query_id", "rn", "neighbor_id", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = inQuery.select("query_id", "rn", "neighbor_id", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b, "indexed search must replay the in-query form exactly")
    // the probe narrows the cells scan via dynamic partition pruning
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"cells scan should carry a dynamic pruning filter:\n${plan.take(2000)}")
  }

  test("q141: mutual-kNN components are exactly the transitive closure") {
    val g = Similarity.knnGraph(emb, k = 5, hasher = PortableSeededHash)
      .where(col("mutual") && col("src") < col("dst"))
      .select("src", "dst").as[(Long, Long)].collect().toSeq
    val out = graft.queries.LlmQueries.knnGraphClusters(spark, Sf0001)
      .select("vec_id", "component", "is_keeper")
      .as[(Long, Long, Boolean)].collect().toSeq
    // reference union-find over the mutual edge set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    g.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = g.flatMap(e => Seq(e._1, e._2)).distinct
    val expect = nodes.map(n => n -> find(n)).toMap
    assert(out.size == nodes.size)
    out.foreach { case (v, c, keeper) =>
      assert(c == expect(v), s"vec $v component")
      assert(keeper == (c == v), s"vec $v keeper flag")
    }
  }

  test("hyperplane signature kernel == exploded spelling, both families, " +
    "single- and multi-table") {
    for (hasher <- Seq(XxSeededHash, PortableSeededHash)) {
      val k1 = Similarity.lshSignatures(emb, planes = 12, hasher)
        .as[(Long, Long)].collect().toSet
      val e1 = Similarity.lshSignatures(emb, planes = 12, hasher,
          kernel = false)
        .as[(Long, Long)].collect().toSet
      assert(k1 == e1, s"single-table ${hasher.name}")
      val km = Similarity.lshSignaturesMulti(emb, tables = 4,
          planesPerTable = 8, hasher)
        .as[(Long, Int, Long)].collect().toSet
      val em = Similarity.lshSignaturesMulti(emb, tables = 4,
          planesPerTable = 8, hasher, kernel = false)
        .as[(Long, Int, Long)].collect().toSet
      assert(km == em, s"multi-table ${hasher.name}")
    }
  }

  test("hamming ANN: planted duplicate is rank 1 at distance 0, ranks " +
    "are hamming-monotone, self excluded") {
    // clone vec 3's embedding onto a fresh id: identical vector ⇒
    // identical sign bits ⇒ hamming 0 ⇒ rank 1 for query 3
    val dup = emb.where(col("vec_id") === 3)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val rows = Similarity.hammingTopK(
        emb.select("vec_id", "embedding").unionByName(dup), k = 5,
        nQueries = 5)
      .select("query_id", "rk", "neighbor_id", "hamming")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, _, n, _) => q != n }, "self excluded")
    val q3 = rows.filter(_._1 == 3L).sortBy(_._2)
    assert(q3.head._3 == 100003L && q3.head._4 == 0L, s"dup rank-1: $q3")
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._2).map(_._4)
      assert(byRank == byRank.sorted, "hamming nondecreasing in rank")
    }
  }

  test("keyed k-means == per-slice k-means, subspace for subspace") {
    val m = 4; val dsub = 16
    val sub = (0 until m).map { s =>
      emb.select(lit(s).as("s"), col("vec_id"),
        expr(s"slice(embedding, ${s * dsub + 1}, $dsub)").as("embedding"))
    }.reduce(_ unionByName _)
    val (ka, kc) = Similarity.kmeansTrainKeyed(sub, k = 8, iters = 2)
    val keyedAssign = ka.as[(Int, Long, Long)].collect().toSet
    val keyedCent = kc.as[(Int, Long, Int, Long)].collect().toSet
    val (sliceAssign, sliceCent) = (0 until m).map { s =>
      val sliced = emb.select(col("vec_id"),
        expr(s"slice(embedding, ${s * dsub + 1}, $dsub)").as("embedding"))
      val (a, c) = Similarity.kmeansTrain(sliced, k = 8, iters = 2)
      (a.select(lit(s).as("s"), col("vec_id"), col("cid"))
         .as[(Int, Long, Long)].collect().toSet,
       c.select(lit(s).as("s"), col("cid"), col("d"), col("m"))
         .as[(Int, Long, Int, Long)].collect().toSet)
    }.reduce((x, y) => (x._1 ++ y._1, x._2 ++ y._2))
    assert(keyedAssign == sliceAssign)
    assert(keyedCent == sliceCent)
  }

  test("hard negatives: band law, self-exclusion, agreement with brute force") {
    val q = emb.where(col("vec_id") < 5)
    val mined = Similarity.hardNegatives(q, emb, k = 5,
        loSim = 0.15, hiSim = 0.35)
      .select("query_id", "rn", "neighbor_id", "sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(mined.nonEmpty)
    // every mined sim is inside the band; never the query itself; <= k per query
    mined.foreach { case (qid, _, nid, s) =>
      assert(s >= 0.15 && s <= 0.35, s"sim $s out of band")
      assert(nid != qid)
    }
    assert(mined.groupBy(_._1).forall(_._2.length <= 5))
    // agreement: the mined set == brute-force scores band-filtered, top-5
    val brute = Similarity.bruteForceTopK(q, emb, k = Int.MaxValue)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
      .as[(Long, Long, Double)].collect()
      .filter { case (_, _, s) => s >= 0.15 && s <= 0.35 }
      .groupBy(_._1).toSeq
      .flatMap { case (_, rows) =>
        rows.sortBy { case (_, nid, s) => (-s, nid) }.take(5).toSeq
      }.toSet
    assert(mined.map { case (a, _, b, s) => (a, b, s) }.toSet == brute)
  }

  test("bitext margin: planted parallel pair mined, one row per src") {
    // src = even ids (4 basis-ish vectors), tgt = odd ids; tgt 1 is a
    // scaled copy of src 0 (cos = 1) while every other cross pair sits
    // in a uniform ~0.5-sim neighborhood — only (0, 1) clears margin.
    val mk = (id: Long, v: Seq[Double]) => (id, v.map(_.toFloat).toArray)
    val vecs = Seq(
      mk(0L, Seq(1, 0, 0, 0)), mk(2L, Seq(0, 1, 0, 0)),
      mk(4L, Seq(0, 0, 1, 0)), mk(6L, Seq(0, 0, 0, 1)),
      mk(1L, Seq(2, 0, 0, 0)), // planted: 2·src0
      mk(3L, Seq(1, 1, 1, 1)), mk(5L, Seq(1, 1, 1, 0)),
      mk(7L, Seq(0, 1, 1, 1)), mk(9L, Seq(1, 0, 1, 1)))
      .toDF("vec_id", "embedding")
    val src = vecs.where(col("vec_id") % 2 === 0)
    val tgt = vecs.where(col("vec_id") % 2 === 1)
    val out = Similarity.bitextMargin(src, tgt, k = 4, threshold = 1.05)
      .select("src_id", "tgt_id", "margin", "mined")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 2L, 4L, 6L), "one row per src")
    val planted = out.find(_._1 == 0L).get
    assert(planted._2 == 1L && planted._4,
      s"planted pair not mined: $planted")
    // the planted margin strictly dominates every decoy margin
    assert(out.filter(_._1 != 0L).forall(_._3 < planted._3))
  }

  test("hashed text embedding: near-identical docs are cosine-near, " +
    "disjoint-vocab docs are not") {
    val base = "the quick brown fox jumps over the lazy dog " +
      "and runs far away into the green woods tonight"
    val docs = Seq(
      (0L, base),
      (1L, base + " extra"),                       // near-twin of 0
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma")    // disjoint vocab
    ).toDF("doc_id", "text")
    val e = Similarity.hashedTextEmbedding(docs, n = 3, buckets = 64, k = 8)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (d, rows) =>
        d -> rows.sortBy(_._2).map(_._3.toDouble)
      }
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val twin = cos(e(0L).toSeq, e(1L).toSeq)
    val far = cos(e(0L).toSeq, e(2L).toSeq)
    assert(twin > 0.9, s"twin sim $twin")
    assert(far < twin - 0.2, s"far $far vs twin $twin")
  }

  test("q205b retrieval laws: planted exact dup fires dup_recalled, " +
    "self at sim 1.0, ranks monotone") {
    // textdata has no exact dup among doc_id < 5 at sf0.01 (the law is
    // vacuous at the gate) — plant one here so every flag is exercised
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q205b").toString
    val base = "spark streams join the filter window over a sorted " +
      "table while the merge scans rows"
    (Seq((0L, base), (1L, "rows merge under a hash shuffle when keys " +
        "collide across the wide exchange"), (7L, base)) ++
      (10L until 40L).map(i => (i, s"doc $i talks about topic ${i % 7} " +
        s"and subject ${i % 11} in plain words ${i * 31}")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmQueries
      .textEmbeddingKernelLaws(spark, dir)
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(0L, 1L))
    got.foreach { case (q, n, _, top1, dup, desc, bounded) =>
      assert(n == 3 && top1 && dup && desc && bounded, s"laws broken: $q")
    }
    // doc 0 has the planted dup (doc 7), doc 1 does not
    assert(got.map(r => r._1 -> r._3).toMap == Map(0L -> true, 1L -> false))
  }

  test("JL projection: exact linearity on representable values, " +
    "null dropped, distance preservation on real embeddings") {
    // 0.5/0.25/0.125 grid: r1000 is exact, so proj(a−b) == proj(a)−proj(b)
    val mk = (id: Long, v: Seq[Double]) => (id, v.map(_.toFloat).toArray)
    val a = Seq(0.5, 0.25, -0.5, 0.125); val b = Seq(0.25, -0.25, 0.5, 0.0)
    val vecs = Seq(mk(0L, a), mk(1L, b),
      mk(2L, a.zip(b).map { case (x, y) => x - y })).toDF("vec_id", "embedding")
    val p = Similarity.jlProject(vecs, k = 8)
      .as[(Long, Seq[Long])].collect().toMap
    assert(p(0L).zip(p(1L)).map { case (x, y) => x - y } == p(2L))

    val withNull = vecs.union(
      Seq((3L, Option.empty[Array[Float]])).toDF("vec_id", "embedding"))
    assert(Similarity.jlProject(withNull, k = 8).count() == 3)

    // statistical JL check on real vectors: mean normalized ratio over
    // consecutive pairs lands near 1 (k=16 -> ~25% per-pair sigma, the
    // MEAN over ~500 pairs is tight)
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .where(col("embedding").isNotNull)
    val red = Similarity.jlProject(emb, k = 16)
    val ra = red.select(col("vec_id").as("id_a"), col("proj").as("pa"))
    val rb = red.select((col("vec_id") - 1).as("id_a"), col("proj").as("pb"))
    val d2r = aggregate(zip_with(col("pa"), col("pb"),
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    val ea = emb.select(col("vec_id").as("id_a"), col("embedding").as("xa"))
    val eb = emb.select((col("vec_id") - 1).as("id_a"),
      col("embedding").as("xb"))
    def fp(c: org.apache.spark.sql.Column) =
      round(c.cast("double") * 1000, 0).cast("long")
    val d2o = aggregate(zip_with(col("xa"), col("xb"), (x, y) => {
      val dx = fp(x) - fp(y); dx * dx
    }), lit(0L), (acc, v) => acc + v)
    val mean = ra.join(rb, "id_a").withColumn("d2r", d2r)
      .join(ea.join(eb, "id_a").withColumn("d2o", d2o)
        .where(pmod(col("id_a"), lit(2L)) === 0), "id_a")
      .where(col("d2o") > 0)
      .agg(avg(col("d2r") / (col("d2o") * 16.0 * 83333.25)))
      .head().getDouble(0)
    assert(mean > 0.8 && mean < 1.2, s"mean JL ratio $mean")
  }

  test("graph-walk ANN: dense ranks, true scores, deterministic across " +
    "partitionings, beats chance") {
    val q = emb.where(col("vec_id") < 10)
    def run(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.graphSearchTopK(q, corpus, k = 5,
          hasher = PortableSeededHash)
        .select("query_id", "rn", "neighbor_id", "sim")
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    val out = run(emb)
    // per-query: dense ranks from 1, no self-answers
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size), s"ranks q$qid")
      assert(rows.forall(_._3 != qid), s"self-answer q$qid")
    }
    // the walk restricts CANDIDATES, never scores: every returned sim is
    // the true 4-dp cosine the exact scan assigns that same pair
    val exactSims = Similarity.bruteForceTopK(q, emb, Int.MaxValue - 1)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 4))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    out.foreach { case (a, _, b, s) =>
      assert(exactSims((a, b)) == s, s"score drift on ($a,$b)") }
    // partitioning-independent (localCheckpoint rounds, rounded ties)
    assert(run(emb.repartition(7)) == out)
    // graph routing from 8 fixed entries still finds some of the exact
    // top-5 mass (the q131 report measures the real recall per sf)
    val exact5 = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(out.map(r => (r._1, r._3)).toSet.intersect(exact5).nonEmpty)
    // beam must cover k
    intercept[IllegalArgumentException](
      Similarity.graphSearchTopK(q, emb, k = 9, beam = 8))
  }

  test("q222: persisted graph index — artifact round-trips bit-exact, " +
    "indexed search == in-memory search off the same inputs, " +
    "centroid entries are nodes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gidx").toString
    Similarity.writeGraphIndex(emb, dir, hasher = PortableSeededHash)
    val (edges, entries) = Similarity.readGraphIndex(spark, dir)
    // the artifact holds exactly the q138 edge list (content-identical
    // through the DSv2 snapshot write → read round trip)
    val built = Similarity.knnGraph(emb, k = 5, hasher = PortableSeededHash)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(edges.as[(Long, Long)].collect().toSet == built)
    // entry points: ≤ numCentroids distinct corpus nodes
    val ent = entries.as[Long].collect().toSeq
    assert(ent.nonEmpty && ent.size <= 8 && ent.distinct.size == ent.size)
    val ids = emb.select("vec_id").as[Long].collect().toSet
    assert(ent.forall(ids))
    // entries replay: the selection is a pure function of the corpus
    assert(Similarity.centroidEntryPoints(emb,
        hasher = PortableSeededHash).as[Long].collect().toSet == ent.toSet)
    // the search over the RELOADED artifact equals the search over the
    // in-memory frames — the artifact is a faithful carrier, and the
    // refactored core is what graphSearchTopK composes (same shape)
    val q = emb.where(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rn", "neighbor_id", "sim")
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    val indexed = rows(Similarity.graphSearchIndexed(q, emb, edges,
      entries, k = 5))
    val inMem = rows(Similarity.graphSearchIndexed(q, emb,
      Similarity.knnGraph(emb, k = 5, hasher = PortableSeededHash)
        .select("src", "dst").localCheckpoint(),
      Similarity.centroidEntryPoints(emb, hasher = PortableSeededHash),
      k = 5))
    assert(indexed == inMem)
    // and graphSearchTopK is the same core with lowest-id entries
    val lowIds = emb.orderBy("vec_id").limit(8)
      .select(col("vec_id").as("node"))
    assert(rows(Similarity.graphSearchIndexed(q, emb, edges, lowIds,
        k = 5)) ==
      rows(Similarity.graphSearchTopK(q, emb, k = 5,
        hasher = PortableSeededHash)))
  }

  test("q225/q226: persisted IVF + PQ codebooks — artifacts round-trip " +
    "bit-exact and the codebook searches equal the in-query forms") {
    val q = emb.where(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rn", "neighbor_id", "sim")
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    // IVF: the artifact holds exactly what kmeansTrain produces
    val ivfDir = java.nio.file.Files.createTempDirectory("graft-ivfcb").toString
    Similarity.writeIvfCodebook(emb, ivfDir, hasher = PortableSeededHash)
    val (assign, cent) = Similarity.readIvfCodebook(spark, ivfDir)
    val (assignM, centM) = Similarity.kmeansTrain(emb,
      hasher = PortableSeededHash)
    assert(assign.as[(Long, Long)].collect().toSet ==
      assignM.as[(Long, Long)].collect().toSet)
    assert(cent.select("cid", "d", "m").as[(Long, Int, Long)]
        .collect().toSet ==
      centM.select("cid", "d", "m").as[(Long, Int, Long)].collect().toSet)
    // search over the RELOADED artifact == the in-query trained form
    assert(rows(Similarity.ivfSearchTrained(q, emb, k = 5, assign, cent)) ==
      rows(Similarity.ivfTopKTrained(q, emb, k = 5,
        hasher = PortableSeededHash)))
    // PQ: codebook + code table round-trip, ADC search equality
    val pqDir = java.nio.file.Files.createTempDirectory("graft-pqcb").toString
    Similarity.writePqCodebook(emb, pqDir, hasher = PortableSeededHash)
    val (codes, cb) = Similarity.readPqCodebook(spark, pqDir)
    assert(rows(Similarity.pqSearch(q, k = 5, m = 4, dims = 64, codes, cb)) ==
      rows(Similarity.pqTopK(q, emb, k = 5, hasher = PortableSeededHash)))
  }
}
