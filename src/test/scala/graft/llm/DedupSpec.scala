package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Dedup operators on a tiny corpus with planted exact and near dups. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat near the river bank"), // near dup of 0
    (3L, "completely different content about spark query engines and plans"),
    (4L, "another unrelated document mentioning neither foxes nor rivers ok")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts copies") {
    val out = Dedup.exact(corpus).orderBy("keep_id")
      .select("keep_id", "dup_count").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("ngram jaccard finds the planted near-dup pair") {
    val pairs = Dedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 2L))) // near dup
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH recalls exact-jaccard pairs on sf0.001 documents") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLsh(docs, estThreshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain near-dups")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall over ${exact.size} pairs")
  }

  test("hot-bucket cap drops degenerate LSH buckets but is lossless below it") {
    // adversarial corpus: 40 copies of one template doc (identical shingle
    // sets -> identical signatures -> one bucket of size 40 in EVERY band)
    // plus one planted normal near-dup pair
    val template = (0 until 40).map(i =>
      (100L + i, "shared boilerplate template text repeated across the corpus"))
    val planted = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bend"))
    val docs = (template ++ planted).toDF("doc_id", "text")

    // cap smaller than the template flood: its buckets are pruned, the
    // planted pair (bucket size 2) survives, and the join stays bounded
    val capped = Dedup.minHashLsh(docs, estThreshold = 0.3, maxBucket = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((0L, 1L)))
    assert(!capped.exists(p => p._1 >= 100L && p._2 >= 100L))

    // below the cap the output is identical to the uncapped join
    val normal = spark.read.parquet(s"$Sf0001/documents.parquet")
    val withCap = Dedup.minHashLsh(normal, estThreshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val noCap = Dedup.minHashLsh(normal, estThreshold = 0.3,
        maxBucket = Int.MaxValue)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(withCap == noCap)
  }

  test("simhash: identical docs have distance 0, near dups small distance") {
    val sig = Dedup.simHash(corpus).orderBy("doc_id")
      .select("simhash").as[Long].collect()
    assert(sig(0) == sig(1))
    assert(java.lang.Long.bitCount(sig(0) ^ sig(2)) <= 12)
    assert(java.lang.Long.bitCount(sig(0) ^ sig(3)) > 12)
  }
}
