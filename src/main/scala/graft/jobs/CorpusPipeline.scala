package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, PortableSeededHash, SeededHash, TextAnalysis, XxSeededHash}

/** The end-to-end training-corpus preparation pipeline — the composite a
  * user of this library actually runs, assembled from the individually
  * gated operators:
  *
  *  1. exact dedup — keep `min(doc_id)` per identical text (q30);
  *  2. MinHash-LSH near-dup candidate pairs over the survivors (q32);
  *  3. connected components → canonical keep-list (q63) and loser drop
  *     (q67);
  *  4. quality scoring + threshold filter (q37);
  *  5. deterministic seeded-hash train/val/test split (q29).
  *
  * Every stage is a shuffle-bounded DataFrame transform (no driver-side
  * loops beyond the O(log diameter) component rounds), so the composite
  * inherits each stage's 100 TB shape. Gated end-to-end as q79 — the
  * oracle recomputes all five stages in DuckDB from the same portable
  * hash family.
  */
object CorpusPipeline {

  /** `docs` needs (doc_id, text, lang, n_chars). Returns one row per
    * surviving document: (doc_id, lang, n_chars, quality, split). */
  def run(docs: DataFrame, minQuality: Double = 0.4, splitSeed: Int = 42,
          hasher: SeededHash = XxSeededHash): DataFrame = {
    val kept = docs.join(
      Dedup.exact(docs).select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val pairs = Dedup.minHashLsh(kept, hasher = hasher)
      .select("doc_a", "doc_b")
    val clean = Dedup.dropNearDups(kept, Dedup.connectedComponents(pairs))
    val scored = clean
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id") +: col("lang") +: col("n_chars") +:
        TextAnalysis.qualityComponentsFromTokens(col("text"), col("toks"))
          .map { case (n, c) => c.as(n) }: _*)
      .select(col("doc_id") +: col("lang") +: col("n_chars") +:
        TextAnalysis.qualityFromComponents(col("n_tokens"), col("n_chars_d"),
          col("punct"), col("stop")).map { case (n, c) => c.as(n) }: _*)
    // filter on the ROUNDED score (the published quality value) so the
    // survivor set is engine-exact
    val bucket = PortableSeededHash.hash(col("doc_id"), splitSeed) % 100
    scored.where(col("quality") >= minQuality)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .select("doc_id", "lang", "n_chars", "quality", "split")
  }
}
