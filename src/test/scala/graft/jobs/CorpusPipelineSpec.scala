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
}
