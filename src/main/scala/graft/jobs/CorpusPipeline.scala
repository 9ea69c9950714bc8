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

  /** The near-dup resolution artifacts, computed from ONE pass over the
    * LSH pipeline: candidate pairs, their connected-component clusters,
    * and the keep-list. Handed out because a library user almost always
    * wants more than one of them (pairs for auditing, clusters for
    * reporting, the keep-list to filter the corpus) — and the LSH pass
    * that produces the pairs is by far the most expensive stage, so
    * computing each view standalone re-runs it per view (the gated
    * q63/q67/q79 queries each do exactly that, deliberately, to stay
    * independently checkable).
    *
    * `pairs` is `localCheckpoint`ed at construction: the minhash/banding
    * pipeline executes exactly once, and both `clusters` (which iterates)
    * and `keepList` derive from the materialized pair set — their plans
    * contain no trace of the LSH lineage (asserted in
    * CorpusPipelineSpec). */
  final case class NearDupArtifacts(pairs: DataFrame, clusters: DataFrame,
                                    keepList: DataFrame)

  /** Compute [[NearDupArtifacts]] over `docs` (needs doc_id, text) with
    * one LSH pass. `keepList` is one row per doc_id that SURVIVES near-dup
    * resolution among the paired documents — i.e. cluster keepers;
    * never-paired documents are absent (they survive by definition, as in
    * [[graft.llm.Dedup.dropNearDups]]). */
  def nearDupArtifacts(docs: DataFrame,
                       hasher: SeededHash = XxSeededHash): NearDupArtifacts = {
    val pairs = Dedup.minHashLsh(docs, hasher = hasher)
      .select("doc_a", "doc_b")
      .localCheckpoint() // the ONE materialization of the LSH pass
    val clusters = Dedup.connectedComponents(pairs)
    val keepList = clusters.where(col("is_keeper")).select("doc_id")
    NearDupArtifacts(pairs, clusters, keepList)
  }

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
