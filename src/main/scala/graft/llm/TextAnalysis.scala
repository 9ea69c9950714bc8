package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline surface:
  * tokenization, shingling, language-ID heuristic, quality scoring, token
  * counting. All pure Column expressions (codegen'd, no UDFs) so they fuse
  * into whole-stage codegen with the surrounding scan/filter — at 100 TB
  * these run at parquet-scan speed.
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles from an ALREADY-PROJECTED token-array column, in
    * document order (with repeats); empty when shorter than n words.
    *
    * Callers must bind the token array to its own column first
    * (`withColumn("toks", tokens(text))`): inlining `split()` here would
    * embed the whole split subtree into every `element_at` inside the
    * lambda, and common-subexpression elimination does not reach inside
    * higher-order-function lambdas — the shingle build would degrade to
    * O(words²) per document. */
  def shinglesFromTokens(w: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*))
    when(size(w) >= n, grams).otherwise(array())
  }

  /** Distinct shingles from a projected token-array column. */
  def distinctShinglesFromTokens(w: Column, n: Int): Column =
    array_distinct(shinglesFromTokens(w, n))

  /** 64-bit n-gram hashes computed from per-token xxhash64 values — the
    * n-gram STRING is never materialized (no concat/allocation in the
    * O(words) lambda); the n token hashes feed xxhash64 again for mixing.
    * Sorted ascending so set operations can run as linear merges.
    * Hash-space collisions (~2^-64 per pair) are the standard near-dup
    * trade-off. */
  def hashedShinglesFromTokens(w: Column, n: Int): Column = {
    val hs = transform(w, t => xxhash64(t))
    val grams = transform(
      sequence(lit(1), size(hs) - (n - 1)),
      i => xxhash64((0 until n).map(j => element_at(hs, i + j)): _*))
    sort_array(array_distinct(
      when(size(hs) >= n, grams).otherwise(array())))
  }

  /** Convenience one-shot forms — only for small inputs / tests; hot paths
    * must use the FromTokens variants on a projected column (see above). */
  def shinglesAll(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)
  def shingles(text: Column, n: Int): Column =
    array_distinct(shinglesAll(text, n))

  /** Language-marker score: how many tokens fall in the marker set. */
  def markerScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*)))
      .cast("long")

  val EnMarkers = Seq("the", "and", "of", "is", "in", "a")
  val DeMarkers = Seq("der", "die", "das", "und", "ist", "ein")
  val FrMarkers = Seq("le", "la", "les", "et", "est", "un")
  val EsMarkers = Seq("el", "los", "y", "es", "una", "que")

  /** Deterministic n-gram-marker language ID: argmax over marker scores
    * with a fixed priority order (en > de > fr > es), 'und' (undetermined)
    * when no marker hits. The heuristic is engine-portable (same CASE
    * chain in the DuckDB oracle). */
  def langId(text: Column): (Seq[(String, Column)], Column) = {
    val scores = Seq(
      "s_en" -> markerScore(text, EnMarkers),
      "s_de" -> markerScore(text, DeMarkers),
      "s_fr" -> markerScore(text, FrMarkers),
      "s_es" -> markerScore(text, EsMarkers))
    val Seq(en, de, fr, es) = scores.map(_._2)
    val predicted =
      when(greatest(en, de, fr, es) === 0, "und")
        .when(en >= greatest(de, fr, es), "en")
        .when(de >= greatest(fr, es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    (scores, predicted)
  }

  /** Quality-score components (length / punctuation / stopword ratios) and
    * the combined score in [0,1]. All arithmetic in double with explicit
    * casts so the oracle agrees bit-for-bit after rounding. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nTok = size(tokens(text)).cast("double")
    val nChars = length(text).cast("double")
    val punct = regexp_count(text, lit("[.,!?;:]")).cast("double")
    val stop = markerScore(text, EnMarkers).cast("double")
    val stopRatio = stop / nTok
    val punctRatio = punct / nChars
    val lenScore = least(nTok / 100.0, lit(1.0))
    val score = lenScore * 0.4 + stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.3
    Seq(
      "n_tokens" -> size(tokens(text)).cast("long"),
      "stop_ratio" -> round(stopRatio, 4),
      "punct_ratio" -> round(punctRatio, 4),
      "quality" -> round(score, 4))
  }

  /** Token counting three ways: whitespace, BPE-ish regex pieces, and the
    * chars/4 heuristic. */
  def tokenCounts(text: Column, nChars: Column): Seq[(String, Column)] = Seq(
    "ws_tokens" -> size(tokens(text)).cast("long"),
    "bpe_ish_tokens" ->
      regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long"),
    "est_tokens" -> ceil(nChars.cast("double") / 4.0).cast("long"))
}
