package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables.table
import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators over documents/embeddings (north-star
  * extensions; SURVEY.md §7.3 step 6). Naive-exact variants are
  * oracle-checked against DuckDB; the LSH scale paths are deterministic
  * but engine-specific (xxhash64) → rows-only checks + unit tests.
  */
object LlmQueries {

  /** Exact dedup by content fingerprint. */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(table(s, dir, "documents")).orderBy("keep_id")

  /** Exact 3-gram Jaccard near-dup pairs (ground truth, oracle-checked). */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(table(s, dir, "documents"), n = 3,
        threshold = 0.1)
      .orderBy("doc_a", "doc_b")

  /** MinHash+LSH near-dup candidates (scale path; engine-specific hashes →
    * rows-only check). */
  def minhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashLsh(table(s, dir, "documents"))
      .orderBy("doc_a", "doc_b")

  /** SimHash near-dup pairs (scale path; rows-only check). */
  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(table(s, dir, "documents"))
      .orderBy("doc_a", "doc_b")

  /** Brute-force cosine top-5 for the first 10 vectors (exact ANN
    * baseline; oracle via DuckDB list_cosine_similarity). */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb.where(col("vec_id") < 10), emb, k = 5)
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
      .orderBy("query_id", "rn")
  }

  /** LSH-bucketed ANN (scale path; recall asserted in unit tests —
    * rows-only check here). */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
    Similarity.lshTopK(emb.where(col("vec_id") < 10), emb, k = 5)
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
      .orderBy("query_id", "rn")
  }

  /** Marker-based language ID with per-language scores. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val (scores, predicted) = TextAnalysis.langId(col("text"))
    table(s, dir, "documents")
      .select(col("doc_id") +: col("lang").as("labeled_lang") +:
        scores.map { case (n, c) => c.as(n) } :+
        predicted.as("predicted"): _*)
      .orderBy("doc_id")
  }

  /** Quality scoring (length/punct/stopword ratios). */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(col("doc_id") +:
        TextAnalysis.qualityColumns(col("text"))
          .map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")

  /** Token counting (whitespace / BPE-ish regex / chars-per-token). */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(col("doc_id") +:
        TextAnalysis.tokenCounts(col("text"), col("n_chars"))
          .map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")

  /** Multimodal plumbing: synth binary column → partition-wise batch
    * "decode" (stub codec, deterministic — oracle re-derives the metadata
    * arithmetically from the text). */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeMedia(s,
        Multimodal.withFakeMedia(table(s, dir, "documents")))
      .toDF()
      .orderBy("doc_id")
}
