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

  /** Canonical normalization for dedup: lowercase, strip sentence
    * punctuation, collapse runs of whitespace, trim — so case / trailing
    * punctuation / spacing variants of the same content fingerprint
    * identically (the preprocessing step in front of
    * [[Dedup.exactNormalized]]). Pure codegen'd string functions; the
    * byte-level output is engine-identical for the ASCII transformations
    * used, which keeps md5 fingerprints oracle-comparable. */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[.,!?;:]", ""), "\\s+", " "))

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

  /** 64-bit n-gram shingle hashes — the n-gram STRING is never
    * materialized; per-token xxhash64 values feed xxhash64 again for
    * mixing. Sorted ascending so set operations can run as linear merges.
    * Hash-space collisions (~2^-64 per pair) are the standard near-dup
    * trade-off.
    *
    * Implemented as the compiled [[graft.functions.HashedShingles]]
    * expression (one O(tokens) pass). The equivalent HOF formulation
    * (`hashedShinglesFromTokensHof`, kept as the parity witness) is
    * O(tokens²) interpreted — CSE cannot reach inside lambda bodies, so
    * each `element_at(hs, ·)` re-evaluated the inner per-token transform;
    * it alone cost ~4.5 s of q72's ~5 s at sf0.1. */
  def hashedShinglesFromTokens(w: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HashedShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(w), n))

  /** Reference HOF formulation of [[hashedShinglesFromTokens]] — value
    * parity is asserted in ExpressionsSpec; not for hot paths. */
  private[graft] def hashedShinglesFromTokensHof(w: Column, n: Int): Column = {
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

  /** Language-marker score: how many tokens fall in the marker set.
    * NOTE: `filter` is a higher-order function and its lambda runs
    * interpreted — callers must bind each score to its own column ONCE
    * and derive everything downstream from the columns, or the score
    * subtree gets re-evaluated inside every referencing expression. */
  def markerScoreFromTokens(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*))).cast("long")

  def markerScore(text: Column, markers: Seq[String]): Column =
    markerScoreFromTokens(tokens(text), markers)

  val EnMarkers = Seq("the", "and", "of", "is", "in", "a")
  val DeMarkers = Seq("der", "die", "das", "und", "ist", "ein")
  val FrMarkers = Seq("le", "la", "les", "et", "est", "un")
  val EsMarkers = Seq("el", "los", "y", "es", "una", "que")

  /** Marker scores for the four detector languages, from a projected
    * token-array column. */
  def langScoresFromTokens(toks: Column): Seq[(String, Column)] = Seq(
    "s_en" -> markerScoreFromTokens(toks, EnMarkers),
    "s_de" -> markerScoreFromTokens(toks, DeMarkers),
    "s_fr" -> markerScoreFromTokens(toks, FrMarkers),
    "s_es" -> markerScoreFromTokens(toks, EsMarkers))

  /** Deterministic argmax over ALREADY-MATERIALIZED score columns with a
    * fixed priority order (en > de > fr > es), 'und' when no marker hits.
    * Taking columns (not score expressions) keeps each score evaluated
    * once — embedding the score subtrees here would re-run their
    * interpreted lambdas inside every CASE branch. */
  def langIdFromScores(en: Column, de: Column, fr: Column, es: Column): Column =
    when(greatest(en, de, fr, es) === 0, "und")
      .when(en >= greatest(de, fr, es), "en")
      .when(de >= greatest(fr, es), "de")
      .when(fr >= es, "fr")
      .otherwise("es")

  /** Quality-score RAW components from a projected token column — bind
    * these once, then combine with [[qualityFromComponents]]. */
  def qualityComponentsFromTokens(text: Column, toks: Column): Seq[(String, Column)] = Seq(
    "n_tokens" -> size(toks).cast("long"),
    "n_chars_d" -> length(text).cast("double"),
    "punct" -> regexp_count(text, lit("[.,!?;:]")).cast("double"),
    "stop" -> markerScoreFromTokens(toks, EnMarkers).cast("double"))

  /** Combined quality score in [0,1] plus the ratio columns, computed from
    * materialized component columns. */
  def qualityFromComponents(nTokens: Column, nCharsD: Column, punct: Column,
                            stop: Column): Seq[(String, Column)] = {
    val nTok = nTokens.cast("double")
    val stopRatio = stop / nTok
    val punctRatio = punct / nCharsD
    val lenScore = least(nTok / 100.0, lit(1.0))
    val score = lenScore * 0.4 + stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.3
    Seq(
      "stop_ratio" -> round(stopRatio, 4),
      "punct_ratio" -> round(punctRatio, 4),
      "quality" -> round(score, 4))
  }

  /** HTML boilerplate removal — the text-extraction step in front of a
    * web-crawl pipeline (the C4/RefinedWeb preprocessing stage: strip
    * markup, drop script/style payloads, decode entities, normalize
    * whitespace). A pure codegen'd regexp chain, so extraction runs at
    * scan speed over a 100 TB crawl — no parser library, no UDF.
    *
    * Dialect note: patterns avoid backreferences and lookarounds so the
    * SAME regexes run under Java regex (Spark) and RE2 (DuckDB oracle);
    * `&amp;` decodes LAST so `&amp;lt;` yields the literal `&lt;` rather
    * than double-decoding. Unmapped entities pass through verbatim. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Shannon entropy of the token unigram distribution (nats) — the
    * low-entropy tail is the repetitive/boilerplate junk a quality
    * pipeline drops (keyword-stuffing, template pages; the diversity
    * signal complementing the q49 distinct-shingle repetition ratio).
    *
    * Determinism: the per-token counts fold over the SORTED distinct
    * tokens, so both engines sum the ln terms in the identical order
    * (the q110 precedent: ln is ≤1-ulp, the 4-dp round makes boundary
    * flips measure-zero; everything else is exact).
    *
    * Compiled ([[graft.functions.TokenEntropy]]): one hash-count pass +
    * one sorted fold per row. The HOF spelling below (the parity
    * witness) is O(distinct·len) with interpreted lambdas — it was
    * ~11 s of the 100× q120 cell. */
  def tokenEntropy(toks: Column): Column =
    round(org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TokenEntropy(
        org.apache.spark.sql.graft.ColumnBridge.expression(toks))), 4)

  /** Reference HOF formulation of [[tokenEntropy]] — value parity is
    * asserted in ExpressionsSpec; not for hot paths. */
  private[graft] def tokenEntropyHof(toks: Column): Column = {
    val n = size(toks).cast("double")
    val counts = transform(array_sort(array_distinct(toks)),
      t => size(filter(toks, x => x === t)).cast("double"))
    round(-aggregate(counts, lit(0.0d),
      (acc, c) => acc + (c / n) * log(c / n)), 4)
  }

  /** Which of `dict`'s terms occur in `text` as substrings, as a sorted
    * array — one compiled Aho–Corasick DFA pass, flat in dictionary size
    * (the naive gate is one `contains` scan per term). See
    * [[graft.functions.MultiContains]]. */
  def multiContains(text: Column, dict: Seq[String]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MultiContains(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), dict))

  /** Token counting three ways: whitespace, BPE-ish regex pieces, and the
    * chars/4 heuristic. */
  def tokenCounts(text: Column, nChars: Column): Seq[(String, Column)] = Seq(
    "ws_tokens" -> size(tokens(text)).cast("long"),
    "bpe_ish_tokens" ->
      regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long"),
    "est_tokens" -> ceil(nChars.cast("double") / 4.0).cast("long"))

  /** UNICODE HYGIENE — the step-0 cleaning pass of a web pipeline
    * (CCNet/Dolma normalize before anything hashes the text):
    *
    *  1. NFC canonical composition ([[graft.functions.NfcNormalize]],
    *     compiled; decomposed "e"+U+0301 → "é" so dedup fingerprints
    *     and shingles see one byte sequence per grapheme);
    *  2. MOJIBAKE repair: the classic UTF-8-read-as-Latin-1 sequences
    *     ("Ã©" → "é", "â€™" → "'", …) reversed by a fixed literal
    *     chain — the high-frequency subset of ftfy's table, each a
    *     plain replace (no regex, oracle-replayable verbatim);
    *  3. C0 control characters stripped (tab/newline survive);
    *  4. whitespace runs collapsed, ends trimmed.
    *
    * Returns (cleaned, n_mojibake) as a pair of Columns; `changed`
    * derives as cleaned =!= input. All scan-speed Column work. */
  def unicodeHygiene(text: Column): (Column, Column) = {
    val nfc = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.NfcNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))
    // ASCII-only \\u escapes so the table cannot be corrupted by a
    // source-encoding mishap; each pair is (UTF-8 bytes misread as
    // cp1252/latin-1, the intended character)
    val fixes: Seq[(String, String)] = Seq(
      "\u00c3\u00a9" -> "\u00e9", // e-acute
      "\u00c3\u00a8" -> "\u00e8", // e-grave
      "\u00c3\u00a4" -> "\u00e4", // a-umlaut
      "\u00c3\u00b6" -> "\u00f6", // o-umlaut
      "\u00c3\u00bc" -> "\u00fc", // u-umlaut
      "\u00c3\u00b1" -> "\u00f1", // n-tilde
      "\u00e2\u20ac\u2122" -> "\u2019", // right single quote
      "\u00e2\u20ac\u0153" -> "\u201c", // left double quote
      "\u00e2\u20ac\u009d" -> "\u201d", // right double quote
      "\u00e2\u20ac\u201c" -> "\u2013") // en dash
    val nMojibake = fixes.map { case (bad, _) =>
      ((length(nfc) - length(replace(nfc, lit(bad), lit("")))) /
        bad.length).cast("long")
    }.reduce(_ + _)
    val repaired = fixes.foldLeft(nfc) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }
    val noCtl = regexp_replace(repaired,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")
    val cleaned = trim(regexp_replace(noCtl, " +", " "))
    (cleaned, nMojibake)
  }

  /** The Gopher repetition-signal suite (Rae et al. 2021, "Scaling
    * Language Models: … Gopher", Table A1): per document,
    *
    *  - `topN_bp` (n = 2, 3, 4): characters in all occurrences of the
    *    most frequent n-gram as basis points of document characters;
    *  - `dupN_bp` (n = 5, 6): characters in duplicate occurrences
    *    (count − 1 per distinct gram) of any repeated n-gram, in basis
    *    points — the DataTrove/Dolma overlap-free spelling of Gopher's
    *    "fraction of characters in duplicated n-grams";
    *  - `passed`: every signal at or under its published Table A1 cut
    *    (top 2/3/4-gram: 20%/18%/16%; dup 5/6-gram: 15%/14%).
    *
    * Determinism: numerators are exact integer character sums (n-gram
    * spelled with single spaces), emitted as INTEGER basis points and
    * gated on those integers — the q121 rounded-cut convention, so a
    * 1-ulp division cannot flip a boundary. Most-frequent ties break on
    * the lexicographically greatest gram in both engines.
    *
    * Scale shape: one gram explode + one (doc, gram) count + one
    * doc-keyed reduce per signal, all corpus-linear with map-side
    * partial aggregation (the q48 TF-IDF shape); the five signal frames
    * re-join on doc_id. Docs shorter than n tokens contribute zero to
    * every signal, the conservative (passing) reading. */
  def gopherRepetition(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val base = docs.select(col("doc_id"), col("n_chars"),
      tokens(col("text")).as("toks"))
    def gramCounts(n: Int) = base
      .select(col("doc_id"), explode(shinglesFromTokens(col("toks"), n))
        .as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("cnt"))
    // a most-frequent gram occurring once is length, not repetition —
    // score 0 below count 2 (the DataTrove reading of Table A1)
    def topChars(n: Int, label: String) = gramCounts(n)
      .groupBy("doc_id")
      .agg(max(struct(col("cnt"), col("g"))).as("top"))
      .select(col("doc_id"),
        when(col("top.cnt") >= 2, col("top.cnt") * length(col("top.g")))
          .otherwise(lit(0L)).as(label))
    def dupChars(n: Int, label: String) = gramCounts(n)
      .groupBy("doc_id")
      .agg(sum(when(col("cnt") >= 2, (col("cnt") - 1) * length(col("g")))
        .otherwise(lit(0L))).as(label))
    def bp(chars: Column): Column =
      round(coalesce(chars, lit(0L)) * 10000.0 / col("n_chars"), 0)
        .cast("long")
    val joined = Seq(topChars(2, "c_top2"), topChars(3, "c_top3"),
        topChars(4, "c_top4"), dupChars(5, "c_dup5"), dupChars(6, "c_dup6"))
      .foldLeft(base.select("doc_id", "n_chars")) { (acc, f) =>
        acc.join(f, Seq("doc_id"), "left")
      }
    joined.select(col("doc_id"), col("n_chars"),
        bp(col("c_top2")).as("top2_bp"), bp(col("c_top3")).as("top3_bp"),
        bp(col("c_top4")).as("top4_bp"), bp(col("c_dup5")).as("dup5_bp"),
        bp(col("c_dup6")).as("dup6_bp"))
      .withColumn("passed",
        col("top2_bp") <= 2000 && col("top3_bp") <= 1800 &&
        col("top4_bp") <= 1600 && col("dup5_bp") <= 1500 &&
        col("dup6_bp") <= 1400)
  }
}
