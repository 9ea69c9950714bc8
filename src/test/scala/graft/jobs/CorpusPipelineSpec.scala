package graft.jobs

import graft.SparkSpec

/** Composite pipeline semantics: every stage visibly removes its target. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline drops exact dups, near dups, and low-quality docs") {
    val quick = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = Seq(
      (0L, quick, "en", 63L),
      (1L, quick, "en", 63L), // exact dup of 0 -> dropped at stage 1
      (2L, quick + " today", "en", 69L), // near dup (jaccard ~0.9) -> stage 3
      (3L, "!!! ??? ;;; ,,, ...", "und", 19L), // punct-only -> quality
      (4L, ("calm evening light settles over the quiet valley and the " +
        "old stone bridge while the river is slow and the air is cool " +
        "and a single bird is calling in the distance").trim, "en", 180L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = CorpusPipeline.run(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(0L)) // keeper of the exact+near cluster
    assert(!out.contains(1L) && !out.contains(2L))
    assert(!out.contains(3L)) // filtered by quality
    assert(out.contains(4L))
  }

  test("nearDupArtifacts: one LSH pass, three consistent views") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val art = CorpusPipeline.nearDupArtifacts(docs)
    // single computation: pairs is checkpointed, so its plan is a bare
    // LogicalRDD — the LSH lineage (window ranks, explodes, self-joins)
    // ran exactly once at construction and is gone from the plan
    assert(art.pairs.queryExecution.optimizedPlan.isInstanceOf[
      org.apache.spark.sql.execution.LogicalRDD])
    // clusters/keepList build on the materialized pairs, not the LSH:
    // neither plan may contain a Window (the LSH rank) or a Generate
    // (the shingle explode)
    Seq(art.clusters, art.keepList).foreach { df =>
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.isEmpty, plan.toString)
    }
    // view consistency: same answers as the standalone operators
    val standalonePairs = graft.llm.Dedup.minHashLsh(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(art.pairs.as[(Long, Long)].collect().toSet == standalonePairs)
    val clusters = art.clusters
      .select("doc_id", "component").as[(Long, Long)].collect().toMap
    val keep = art.keepList.as[Long].collect().toSet
    assert(keep == clusters.collect {
      case (id, comp) if id == comp => id
    }.toSet)
    assert(keep.nonEmpty && clusters.nonEmpty)
  }

  test("split assignment is deterministic and complete") {
    val docs = (0L until 50L)
      .map(i => (i, s"document number $i with some plain text", "en", 40L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val a = CorpusPipeline.run(docs, minQuality = 0.0)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = CorpusPipeline.run(docs, minQuality = 0.0)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("full-pipeline manifest: dense epoch order over deduped train docs") {
    import org.apache.spark.sql.functions.col
    val out = graft.queries.LlmQueries.fullPipelineManifest(spark, Sf0001)
      .as[(Long, String, Long)].collect().toSeq
    assert(out.nonEmpty)
    // ord is a dense permutation 0..n-1 in output order
    assert(out.map(_._3) == out.indices.map(_.toLong))
    // every selected doc survived stage 1 (dedup + quality, train split)
    val clean = CorpusPipeline.run(
        graft.io.Tables.table(spark, Sf0001, "documents"),
        hasher = graft.llm.PortableSeededHash)
      .where(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet.subsetOf(clean))
  }
}
