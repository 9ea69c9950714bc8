package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the training-data mixing knob:
  * keep a different fraction of each stratum (language, quality band,
  * source) with a seeded-hash coin so the sample is reproducible across
  * runs, engines and re-partitioning (no `rand()`, no sampleBy RNG
  * state).
  *
  * Scale shape: pure scan-level filter — the per-row hash and the rate
  * lookup (a small when-chain; broadcast-join a rates table instead if
  * strata are dynamic) run inside whole-stage codegen, no shuffle, no
  * driver state. The same predicate replays in any engine with the
  * portable hash family, which is what the q87 oracle does.
  */
object Sampling {

  /** Keep each row of stratum s with probability ≈ rates(s) (exact
    * fraction of the hash space): hash(seed, id) mod 10000 < rate·10000.
    * `default` applies to strata absent from `rates`. */
  def stratified(df: DataFrame, idCol: Column, stratumCol: Column,
                 rates: Map[String, Double], default: Double = 0.0,
                 seed: Int = 17,
                 hasher: SeededHash = XxSeededHash): DataFrame = {
    require((rates.values ++ Seq(default)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val bucket = pmod(hasher.hash(idCol, seed), lit(10000L))
    val rate = rates.foldLeft(lit(default)) { case (acc, (s, r)) =>
      when(stratumCol === s, lit(r)).otherwise(acc)
    }
    // round BEFORE the cast: 0.3*10000 is 2999.999… in doubles and a raw
    // cast truncates, shifting the threshold by one hash bucket
    df.where(bucket < round(rate * 10000.0).cast("long"))
  }

  /** Weighted per-stratum UP/DOWN-sampling — the other half of the
    * training-mix knob: weight 2.5 repeats a row 2 times plus a 50%
    * deterministic coin for a 3rd; weight 0.3 keeps the row with
    * probability 0.3. Emits a `copy_idx` column (0-based) so downstream
    * shuffles can decorrelate the copies. Same scan-level shape as
    * [[stratified]] — the explode is map-side, no shuffle, no RNG
    * state. */
  def upsampleByStratum(df: DataFrame, idCol: Column, stratumCol: Column,
                        weights: Map[String, Double], default: Double = 1.0,
                        seed: Int = 23,
                        hasher: SeededHash = XxSeededHash): DataFrame = {
    require((weights.values ++ Seq(default)).forall(_ >= 0),
      "weights must be non-negative")
    val w = weights.foldLeft(lit(default)) { case (acc, (s, r)) =>
      when(stratumCol === s, lit(r)).otherwise(acc)
    }
    val base = floor(w).cast("long")
    val coin = pmod(hasher.hash(idCol, seed), lit(10000L)) <
      round((w - floor(w)) * 10000.0).cast("long")
    val copies = base + when(coin, 1L).otherwise(0L)
    df.withColumn("copy_idx",
        explode(when(copies > 0, sequence(lit(0L), copies - 1))
          .otherwise(array().cast("array<bigint>"))))
  }

  /** Token-budget DOMAIN MIXTURE selection — the static data-mixing pass
    * of a pre-training pipeline (the fixed-weight regime of DoReMi /
    * The Pile recipes: "x billion tokens of web, y of code, z of
    * books"): per domain, select documents in a deterministic seeded-
    * hash order until that domain's token budget is reached. Prefix
    * semantics, not bin-packing: the first document whose running total
    * EXCEEDS the budget is dropped, and no later document is pulled in
    * to backfill — so the selection is a stable hash-order prefix,
    * reproducible across runs, engines and partitionings, and a larger
    * budget strictly extends the smaller selection.
    *
    * Scale shape: the [[packSequences]] two-phase distributed prefix
    * sum, partitioned per (domain, bucket) — no whole-domain window
    * funnels a 100-TB domain through one task; the per-domain bucket
    * offsets are a numBuckets-row aggregate broadcast back.
    *
    * Output: every document with (doc_id, domain, n_tokens, cum_tokens,
    * kept) — kept = running total within budget; all rows returned so
    * the caller can audit the cut line or re-budget without re-ranking.
    */
  def mixtureByBudget(docs: DataFrame, idCol: Column, domainCol: Column,
                      budgets: Map[String, Long], numBuckets: Int = 8,
                      seed: Int = 31,
                      hasher: SeededHash = XxSeededHash): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgets.values.forall(_ >= 0), "token budgets must be >= 0")
    require(numBuckets > 0)
    val h = hasher.hash(idCol, seed)
    val toks = size(split(col("text"), " ")).cast("long")
    val base = docs.select(idCol.as("doc_id"), domainCol.as("domain"),
      toks.as("n_tokens"), h.as("h"),
      pmod(h, lit(numBuckets.toLong)).as("bucket"))
    val wB = Window.partitionBy("domain", "bucket")
      .orderBy(col("h"), col("doc_id"))
    val partial = base.withColumn("cum_b", sum(col("n_tokens")).over(wB))
    val offsets = partial.groupBy("domain", "bucket")
      .agg(max(col("cum_b")).as("total"))
      .withColumn("bucket_offset",
        coalesce(sum(col("total")).over(
          Window.partitionBy("domain").orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("domain", "bucket", "bucket_offset")
    // domains absent from `budgets` get budget 0: scored, never kept
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (d, b)) =>
      when(col("domain") === d, lit(b)).otherwise(acc)
    }
    partial.join(broadcast(offsets), Seq("domain", "bucket"))
      .withColumn("cum_tokens", col("bucket_offset") + col("cum_b"))
      .select(col("doc_id"), col("domain"), col("n_tokens"),
        col("cum_tokens"), (col("cum_tokens") <= budget).as("kept"))
  }

  /** Temperature-scaled (α-) sampling — the multilingual rebalancing rule
    * of XLM-R / mT5 (Conneau et al. 2020 §3.1; Xue et al. 2021 §3.2):
    * sample stratum s with probability ∝ p(s)^α, α < 1 flattening the
    * head so low-resource strata are over-represented relative to their
    * corpus share. Where [[stratified]] takes CALLER-chosen rates, this
    * derives them FROM THE DATA: with n_s rows in stratum s, the keep
    * rate is
    *
    *   r_s = min(1, c · n_s^(α-1))
    *
    * (the per-row acceptance probability that realizes q_s ∝ n_s^α up to
    * the caller's global multiplier `c`, which sets the overall output
    * size — the normalizer Σ n_s^α is folded into c rather than computed,
    * so no cross-stratum float reduction exists to make bit-exactness
    * depend on summation order). The keep decision is the same seeded
    * portable-hash coin as [[stratified]].
    *
    * For α = 0.5 the rate is spelled `c / sqrt(n)`: IEEE-754 requires
    * sqrt, divide and multiply to be correctly rounded, so the threshold
    * is bit-identical in any compliant engine and the selection is
    * oracle-exact. Other α go through `pow`, which carries no such
    * guarantee (documented: rows-check only).
    *
    * Scale shape: one tiny per-stratum count aggregate (map-side combine
    * collapses it to |strata| rows), broadcast back, then a scan-level
    * hash-coin filter — no data shuffle, no driver collect.
    *
    * Output: every row with (idCol, stratum, n_stratum, threshold_bp,
    * kept) — the audit shape of [[mixtureByBudget]]. */
  def temperatureSampled(df: DataFrame, idCol: Column, stratumCol: Column,
                         c: Double, alpha: Double = 0.5, seed: Int = 41,
                         hasher: SeededHash = XxSeededHash): DataFrame = {
    require(c > 0, "global rate multiplier c must be > 0")
    require(alpha > 0 && alpha <= 1, "temperature alpha must be in (0, 1]")
    val counts = df.groupBy(stratumCol.as("stratum"))
      .agg(count(lit(1)).as("n_stratum"))
    val nD = col("n_stratum").cast("double")
    // c·n^(α-1), scaled to a 10000-bucket integer threshold. α = 0.5 is
    // spelled with sqrt (correctly rounded ⇒ cross-engine bit-identical);
    // the literal 10000·c is folded at plan time so both engines see one
    // exact double constant.
    val rateScaled =
      if (alpha == 0.5) lit(10000.0 * c) / sqrt(nD)
      else lit(10000.0 * c) * pow(nD, alpha - 1.0)
    val thresh = least(lit(10000L), floor(rateScaled).cast("long"))
    val rates = counts.withColumn("threshold_bp", thresh)
    df.select(idCol.as("id"), stratumCol.as("stratum"))
      .join(broadcast(rates), "stratum")
      .select(col("id"), col("stratum"), col("n_stratum"),
        col("threshold_bp"),
        (pmod(hasher.hash(col("id"), seed), lit(10000L)) <
          col("threshold_bp")).as("kept"))
  }

  /** Deterministic global training order — the "shuffle the corpus once
    * per epoch" step of a pre-training pipeline, with the RNG replaced by
    * the seeded-hash total order (bucket, hash, id): reproducible across
    * runs/engines/partitionings, a different permutation per `seed`
    * (= epoch), and no `rand()` state to checkpoint.
    *
    * Scale shape: the [[packSequences]] two-phase prefix sum with
    * row-COUNT in place of token-sum — per-bucket `row_number` windows
    * (parallel across `numBuckets`), bucket counts prefix-summed into
    * offsets and broadcast back. No global window, no single-partition
    * funnel.
    *
    * Output: (id, ord) with ord a dense 0-based permutation index. */
  def shuffleOrder(df: DataFrame, idCol: Column, numBuckets: Int = 1024,
                   seed: Int = 37,
                   hasher: SeededHash = XxSeededHash): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numBuckets > 0)
    val h = hasher.hash(idCol, seed)
    val base = df.select(idCol.as("id"), h.as("h"),
      pmod(h, lit(numBuckets.toLong)).as("bucket"))
    val wB = Window.partitionBy("bucket").orderBy(col("h"), col("id"))
    val partial = base.withColumn("rn",
      row_number().over(wB).cast("long"))
    val offsets = partial.groupBy("bucket")
      .agg(count(lit(1)).as("total"))
      .withColumn("bucket_offset",
        coalesce(sum(col("total")).over(
          Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "bucket_offset")
    partial.join(broadcast(offsets), "bucket")
      .select(col("id"), (col("bucket_offset") + col("rn") - 1).as("ord"))
  }

  /** Weighted sampling WITHOUT replacement (q209; Efraimidis & Spirakis
    * 2006, "Weighted random sampling with a reservoir" — algorithm
    * A-ES): each row draws u ∈ (0, 1] from the seeded portable hash and
    * keys itself by ln(u)/w (the order-equivalent log spelling of
    * u^(1/w)); the k LARGEST keys are the sample, and inclusion
    * probability is proportional to weight, exactly — the weighted
    * counterpart of the uniform bottom-k reservoir (q145).
    *
    * Determinism across engines: u is exact integer arithmetic
    * ((h+1)/2^60), but ln is only ≤1-ulp reproducible — so the cut
    * ranks on the 10-dp ROUNDED key with an id tie-break (the q121
    * rounded-cut convention: a 1-ulp wobble cannot reorder a rounded
    * boundary except on measure-zero ties, which the id breaks).
    *
    * Scale shape: pure per-row key computation + one bounded
    * sort-limit top-k (per-partition partial top-k, k rows per
    * partition to the final merge) — no global sort, no shuffle of the
    * corpus. */
  def weightedSample(df: DataFrame, idCol: Column, weightCol: Column,
                     k: Int, seed: Int = 91): DataFrame = {
    require(k >= 1)
    val h = PortableSeededHash.hash(idCol, seed)
    // u in (0, 1]: (h + 1) / 2^60 as exact double (both operands < 2^60)
    val u = (h + 1).cast("double") / lit((1L << 60).toDouble)
    val key = round(log(u) / weightCol.cast("double"), 10)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("es_key").desc, col("id"))
    df.select(idCol.as("id"), weightCol.cast("long").as("weight"),
        key.as("es_key"))
      .orderBy(col("es_key").desc, col("id"))
      .limit(k)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select("rn", "id", "weight", "es_key")
  }

  /** Global rank 1..N by (`value` DESC, `id` ASC) WITHOUT a global
    * window — the [[shuffleOrder]] two-phase machinery pointed at a
    * value ordering instead of a hash ordering:
    *
    *  1. `bin` must be a monotone NON-DECREASING coarsening of `value`
    *     (equal bin ⇒ ranked by the within-bin window); each bin's rows
    *     rank in parallel under a window partitioned BY BIN;
    *  2. bin counts (one tiny aggregate) prefix-sum in DESCENDING bin
    *     order into global offsets, broadcast back.
    *
    * The global window spelling (`row_number() OVER (ORDER BY …)`)
    * funnels the corpus through ONE task; this one's largest sequential
    * unit is a bin. Output: (id, rank). */
  def globalRankDesc(df: DataFrame, valueCol: Column, binCol: Column,
                     idCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(idCol.as("id"), valueCol.as("v"),
      binCol.as("bin"))
    val wB = Window.partitionBy("bin")
      .orderBy(col("v").desc, col("id"))
    val partial = base.withColumn("rn",
      row_number().over(wB).cast("long"))
    // The monotone-coarsening contract is easy to violate silently
    // (mixed-sign values with truncating vs flooring division are the
    // classic trap), so it is VALIDATED on the bins aggregate: in
    // descending bin order, every bin's max(v) must be ≤ the
    // next-higher bin's min(v). The check rides the tiny offsets frame
    // (one lag + one assert_true folded into the offset arithmetic so
    // column pruning can't drop it) and fails loudly instead of
    // producing wrong global ranks.
    val wDesc = Window.orderBy(col("bin").desc)
    val offsets = partial.groupBy("bin")
      .agg(count(lit(1)).as("total"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      .withColumn("hi_vmin", lag(col("vmin"), 1).over(wDesc))
      .withColumn("bin_offset",
        coalesce(sum(col("total")).over(
          wDesc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) +
          coalesce(assert_true(
            col("hi_vmin").isNull || col("vmax") <= col("hi_vmin"),
            concat(lit("globalRankDesc: bin is not a monotone " +
              "non-decreasing coarsening of value near bin "),
              col("bin").cast("string"))).cast("long"), lit(0L)))
      .select("bin", "bin_offset")
    partial.join(broadcast(offsets), "bin")
      .select(col("id"), (col("bin_offset") + col("rn")).as("rank"))
  }

  /** GPT-style sequence packing: documents concatenated in a
    * deterministic seeded-hash order and split into fixed `budget`-token
    * training sequences; each document reports the sequence containing
    * its first token and its offset within it ("concatenate then split" —
    * the standard pre-training packing; a straddling document simply
    * continues into the next sequence).
    *
    * Scale shape — a two-phase distributed prefix sum, NOT a global
    * window (a partition-less window funnels the corpus through one
    * task):
    *   1. each document lands in one of `numBuckets` hash buckets; the
    *      canonical concatenation order is (bucket, hash, doc_id);
    *   2. within-bucket running totals are a window partitioned BY BUCKET
    *      (parallel across buckets);
    *   3. bucket token totals (one tiny numBuckets-row aggregate) prefix-
    *      sum into global bucket offsets, broadcast back.
    * Everything is integer arithmetic on a portable hash order, so the
    * q89 oracle replays the packing exactly. */
  def packSequences(docs: DataFrame, budget: Int, numBuckets: Int = 8,
                    seed: Int = 29,
                    hasher: SeededHash = XxSeededHash): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && numBuckets > 0)
    val h = hasher.hash(col("doc_id"), seed)
    val toks = size(split(col("text"), " ")).cast("long")
    val base = docs.select(col("doc_id"), toks.as("n_tokens"), h.as("h"),
      pmod(h, lit(numBuckets.toLong)).as("bucket"))
    val wB = Window.partitionBy("bucket").orderBy(col("h"), col("doc_id"))
    val partial = base.withColumn("cum",
      sum(col("n_tokens")).over(wB)) // running total INCLUDING this doc
    val offsets = partial.groupBy("bucket")
      .agg(max(col("cum")).as("total"))
      .withColumn("bucket_offset",
        coalesce(sum(col("total")).over(
          Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "bucket_offset")
    partial.join(broadcast(offsets), "bucket")
      .withColumn("start", col("bucket_offset") + col("cum") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        // integer division end-to-end — no float in the bucketing math
        expr(s"start div $budget").as("seq_id"),
        pmod(col("start"), lit(budget.toLong)).as("seq_offset"))
  }

  /** Bottom-k consistent sample per key — the distributed replacement for
    * per-key reservoir sampling: keep the k rows whose seeded hash of
    * `idCol` is SMALLEST within each key. Unlike a reservoir (whose
    * contents depend on encounter order and RNG state), the bottom-k set
    * is a pure function of the ids, so it is stable across runs,
    * partitionings and engines, and MERGEABLE: bottom-k of a union is
    * the bottom-k of the per-shard bottom-k's — each day's sample
    * coalesces into the corpus sample with no resampling pass (Cohen &
    * Kaplan 2007, bottom-k sketches).
    *
    * The same k smallest hashes are a KMV distinct-count sketch
    * (Bar-Yossef et al. 2002): with U = 2^60 the portable-hash range,
    * `est_distinct = (k-1)·U div h_k` where h_k is the k-th smallest —
    * emitted per key (NULL when the key has < k rows; the exact count is
    * sitting in the sample itself). Integer arithmetic end-to-end, so
    * the estimator replays exactly in the oracle.
    *
    * Scale shape: one hash shuffle on the key; rank-k selection is a
    * running window (or [[graft.plans.TopKPerKey]]'s bounded heap via
    * the native path) — per-key state is k rows no matter the key's
    * cardinality, the flood-proof property that makes this the 100 TB
    * per-domain sampler. */
  def bottomKPerKey(df: DataFrame, keyCol: Column, idCol: Column, k: Int,
                    seed: Int = 45,
                    hasher: SeededHash = PortableSeededHash): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "KMV needs k >= 2")
    val hashed = df.withColumn("h", hasher.hash(idCol, seed))
    val w = Window.partitionBy(keyCol).orderBy(col("h"), idCol)
    val wk = Window.partitionBy(keyCol)
    // U = 2^60: PortableSeededHash range (md5 top 60 bits). For the xx64
    // family the estimator would need the signed range remapped to
    // [0, 2^64) — keep the portable family for the sketch math.
    // (k-1)·U can exceed 2^63, so the numerator is a decimal literal and
    // the division an IntegralDivide (exact; DuckDB replays via HUGEINT).
    val num = (BigInt(k) - 1) * (BigInt(1) << 60)
    hashed.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      // h_k = k-th smallest hash, present only when the key has ≥ k rows
      .withColumn("h_k", max(when(col("rn") === k, col("h"))).over(wk))
      .withColumn("est_distinct",
        expr(s"cast('$num' as decimal(38,0)) div h_k"))
      .drop("h_k")
  }

  /** Packed-batch MATERIALIZATION over [[packSequences]]' assignment —
    * the step that turns (doc → seq_id, seq_offset) bookkeeping into the
    * actual fixed-length training sequences a loader memory-maps: each
    * document's tokens are sliced across every sequence its global span
    * [start, start+n) overlaps (concatenate-then-split semantics — docs
    * cross sequence boundaries, the GPT-style packing that wastes zero
    * budget), pieces reassemble per sequence in global token order, and
    * `boundaries` records the within-sequence offsets where documents
    * BEGIN — exactly what a trainer needs to reset attention masks /
    * position ids at document starts.
    *
    * Every sequence is exactly `budget` tokens except the last
    * (asserted in SamplingSpec together with the end-to-end
    * concatenation identity: joining all sequences in order reproduces
    * the canonical-order token stream).
    *
    * Scale shape: the q89 two-phase prefix (no global window), one
    * explode over ≤⌈n/budget⌉+1 spans per doc, one groupBy(seq_id)
    * reassembly of position-sorted pieces — corpus-linear in token
    * volume, the q188 reassembly shape. */
  def packedBatches(docs: DataFrame, budget: Int = 512,
                    numBuckets: Int = 8, seed: Int = 29,
                    hasher: SeededHash = XxSeededHash): DataFrame = {
    val bL = budget.toLong
    val packed = packSequences(docs, budget, numBuckets, seed, hasher)
      .withColumn("start", col("seq_id") * bL + col("seq_offset"))
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val spans = packed.join(toks, "doc_id")
      .withColumn("s", explode(sequence(expr(s"start div $bL"),
        expr(s"(start + n_tokens - 1) div $bL"))))
      .select(col("s").as("seq_id"), col("start"),
        (greatest(col("s") * bL, col("start")) - col("start") + 1)
          .cast("int").as("a"),
        (least((col("s") + 1) * bL, col("start") + col("n_tokens")) -
          col("start")).cast("int").as("b"),
        col("t"))
    val pieces = spans.select(col("seq_id"), col("start"), col("a"),
      (col("b") - col("a") + 1).cast("long").as("len"),
      (col("start") - expr(s"(start div $bL) * $bL")).as("off0"),
      array_join(slice(col("t"), col("a"), col("b") - col("a") + 1), " ")
        .as("ptxt"))
    pieces.groupBy("seq_id").agg(
      count(lit(1)).as("n_pieces"),
      sum(col("len")).as("n_tokens"),
      array_join(transform(array_sort(collect_list(when(col("a") === 1,
          struct(col("start"), col("off0").cast("string").as("o"))))),
        x => x.getField("o")), "|").as("boundaries"),
      array_join(transform(array_sort(collect_list(
          struct(col("start"), col("ptxt").as("p")))),
        x => x.getField("p")), " ").as("seq_text"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): rewrite a
    * hash-chosen fraction of documents into PSM order —
    * `<PRE> prefix <SUF> suffix <MID> middle` — so an autoregressive
    * model learns infilling from plain left-to-right training; the rest
    * pass through untouched (the paper's 50/50 joint recipe).
    *
    * Two seeded-hash cut points per document (the q29/q113 no-rand()
    * convention: the transform is a pure function of the data), sorted
    * into [lo, hi); all three segments are array slices of the token
    * stream reassembled around sentinel tokens — empty segments
    * degrade gracefully (consecutive sentinels), exactly as in
    * production FIM corpora.
    *
    * Scale shape: pure per-row Column work — split, two hashes, three
    * slices, one join — whole-stage codegen, zero shuffles. */
  def fimTransform(docs: DataFrame, fimPct: Int = 50,
                   seed: Int = 63,
                   hasher: SeededHash = XxSeededHash): DataFrame = {
    require(fimPct >= 0 && fimPct <= 100)
    val toks = split(col("text"), " ")
    val n = size(toks).cast("long")
    val a = pmod(hasher.hash(col("doc_id"), seed), n)
    val b = pmod(hasher.hash(col("doc_id"), seed + 1), n)
    val gate = pmod(hasher.hash(col("doc_id"), seed + 2), lit(100L)) < fimPct
    val lo = (least(a, b) + 1).cast("int")
    val hi = (greatest(a, b) + 1).cast("int")
    val nI = n.cast("int")
    val psm = array_join(concat(
      array(lit("<PRE>")), slice(toks, lit(1), lo - 1),
      array(lit("<SUF>")), slice(toks, hi, nI - hi + 1),
      array(lit("<MID>")), slice(toks, lo, hi - lo)), " ")
    docs.select(col("doc_id"), gate.as("fim_applied"), n.as("n_tokens"),
      when(gate, psm).otherwise(col("text")).as("text_fim"))
  }

  /** T5-style span corruption (Raffel et al. 2020, §3.1.4): the final
    * transform between a curated corpus and a denoising trainer — each
    * document becomes an (input, target) pair where masked token SPANS
    * are replaced by numbered sentinels in the input and enumerated
    * after their sentinels in the target.
    *
    * Mask decisions are seeded-hash coins on (doc_id, position) — the
    * q29/q113 no-rand() convention, so the corruption is a pure function
    * of the data: reproducible across runs, partitionings and engines,
    * and any example can be regenerated from its doc alone. Runs of
    * consecutive masked positions collapse into ONE sentinel
    * (gaps-and-islands over the per-doc window, the q128 merge
    * machinery); sentinels number left to right per document.
    *
    * Scale shape: posexplode + per-DOC partitioned windows (lag +
    * running sum — no global window anywhere) + one groupBy(doc_id)
    * reassembly of position-sorted pieces. Corpus-linear, exactly the
    * q134 reassembly shape. */
  def spanCorruption(docs: DataFrame, ratePct: Int = 15, seed: Int = 61,
                     hasher: SeededHash = XxSeededHash): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ratePct >= 0 && ratePct <= 100)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val toks = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
    val masked = toks.withColumn("msk",
      pmod(hasher.hash(concat_ws(":", col("doc_id"), col("pos")), seed),
        lit(100L)) < ratePct)
    val spans = masked
      .withColumn("st",
        col("msk") && !coalesce(lag("msk", 1).over(byDoc), lit(false)))
      .withColumn("span_id",
        sum(when(col("st"), lit(1L)).otherwise(lit(0L))).over(byDoc))
    val sentinel = concat(lit("<X"), col("span_id") - 1, lit(">"))
    val pieces = spans.select(col("doc_id"), col("pos"), col("msk"),
      col("span_id"),
      when(!col("msk"), col("tok"))
        .when(col("st"), sentinel).as("ip"),
      when(col("msk") && col("st"),
          concat(sentinel, lit(" "), col("tok")))
        .when(col("msk"), col("tok")).as("tp"))
    def joined(c: String) = array_join(transform(
      array_sort(collect_list(when(col(c).isNotNull,
        struct(col("pos"), col(c).as("piece"))))),
      s => s.getField("piece")), " ")
    pieces.groupBy("doc_id").agg(
      joined("ip").as("input_text"),
      joined("tp").as("target_text"),
      coalesce(max(col("span_id")), lit(0L)).as("n_spans"),
      sum(when(col("msk"), 1L).otherwise(0L)).as("n_masked"))
  }

  /** UniMax language-budget allocation + epoch-capped sampling (Chung
    * et al. 2023 — the budget-driven successor to temperature
    * sampling for multilingual pretraining mixes): given a total token
    * budget B = floor(corpus_tokens * budgetNumer / budgetDenom) and a
    * per-language epoch cap E, allocate B across languages by
    * WATER-FILLING in ascending capacity order (capacity = E * the
    * language's tokens): each language takes the smaller of its
    * capacity and an even share of what remains; a low-resource
    * language that cannot absorb its share caps at E epochs and the
    * leftover redistributes to larger languages. The head is
    * down-sampled, the tail is repeated — but never past E epochs (the
    * failure mode temperature sampling has no guard for).
    *
    * All arithmetic is INTEGER (token counts, `div` floors), so the
    * allocation is engine-exact. The threshold is DEFINED as
    * t = max k with capacity_k <= (B - prefix_{k-1}) div (L - k + 1)
    * (ascending capacity, ties by language); ranks <= t take their
    * capacity, the rest take the share evaluated at rank t + 1 —
    * floor remainders stay unallocated (documented, deterministic)
    * rather than being smeared by fractional arithmetic.
    *
    * The allocation is then APPLIED: the corpus repeats epoch-major
    * (epoch 0 first — whole passes before a partial one, the "repeat
    * up to E times then truncate" the cap means), ordered inside each
    * epoch by the seeded portable hash, and a language keeps its
    * prefix with cumulative tokens <= its allocation. The cumulative
    * sum is the q89/q109 two-phase bucketed prefix (per-(lang, epoch,
    * bucket) window + broadcast bucket offsets) — no global window at
    * any corpus size. Output: one row per language with corpus /
    * capacity / allocation / kept-set numbers.
    *
    * Scale shape: one tokens-per-language shuffle (map-side combined
    * to L rows), the water-fill on the L-row language frame
    * (vocabulary-sized single-partition windows), and the kept-prefix
    * scan over E corpus copies with bounded per-(lang, epoch, bucket)
    * windows. */
  def unimax(docs: DataFrame, idCol: Column, langCol: Column,
             budgetNumer: Long, budgetDenom: Long, epochs: Int,
             numBuckets: Int = 8, seed: Int = 37,
             hasher: SeededHash = PortableSeededHash): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(epochs >= 1, "epoch cap must be >= 1")
    require(budgetNumer >= 0 && budgetDenom > 0, "budget must be >= 0")
    require(numBuckets > 0)
    val h = hasher.hash(idCol, seed)
    val base = docs.select(idCol.as("doc_id"), langCol.as("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      h.as("h"), pmod(h, lit(numBuckets.toLong)).as("bucket"))
    val perLang = base.groupBy("lang")
      .agg(sum("n_tokens").as("lang_tokens"),
        count(lit(1)).cast("long").as("lang_docs"))
    val totals = perLang.agg(sum("lang_tokens").as("corpus_tokens"),
      count(lit(1)).cast("long").as("n_langs"))
    // the language frame: <= a few hundred rows at ANY corpus size —
    // single-partition windows are the right plan here
    val wAsc = Window.orderBy("capacity", "lang")
    val ranked = perLang.crossJoin(broadcast(totals))
      .withColumn("budget",
        expr(s"(corpus_tokens * $budgetNumer) div $budgetDenom"))
      .withColumn("capacity", col("lang_tokens") * epochs)
      .withColumn("k", row_number().over(wAsc).cast("long"))
      .withColumn("prefix", coalesce(sum("capacity").over(
        wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("even_share",
        expr("(budget - prefix) div (n_langs - k + 1)"))
      .withColumn("takes_cap", col("capacity") <= col("even_share"))
    val wAll = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val allocs = ranked
      .withColumn("tt", coalesce(
        max(when(col("takes_cap"), col("k"))).over(wAll), lit(0L)))
      // every share-limited language receives the share evaluated at
      // rank t+1 (re-deriving it per-row would drift by accumulated
      // floor remainders); t = L means everything fit under its cap
      .withColumn("share", max(when(col("k") === col("tt") + 1,
        col("even_share"))).over(wAll))
      .withColumn("alloc_tokens", when(col("k") <= col("tt"),
        col("capacity")).otherwise(greatest(col("share"), lit(0L))))
      .select("lang", "lang_docs", "lang_tokens", "capacity",
        "alloc_tokens")
    // apply: epoch-major repeats, two-phase bucketed prefix per lang
    val copies = docs.sparkSession.range(epochs.toLong)
      .select(col("id").as("epoch"))
    val wB = Window.partitionBy("lang", "epoch", "bucket")
      .orderBy("h", "doc_id")
    val partial = base.crossJoin(broadcast(copies))
      .withColumn("cum_b", sum("n_tokens").over(wB))
    val offsets = partial.groupBy("lang", "epoch", "bucket")
      .agg(max("cum_b").as("total_b"))
      .withColumn("off", coalesce(sum("total_b").over(
        Window.partitionBy("lang").orderBy("epoch", "bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("lang", "epoch", "bucket", "off")
    val keptStats = partial
      .join(broadcast(offsets), Seq("lang", "epoch", "bucket"))
      .join(broadcast(allocs.select("lang", "alloc_tokens")), Seq("lang"))
      .where(col("off") + col("cum_b") <= col("alloc_tokens"))
      .groupBy("lang").agg(count(lit(1)).cast("long").as("n_kept"),
        sum("n_tokens").as("kept_tokens"))
    allocs.join(keptStats, Seq("lang"), "left")
      .select(col("lang"), col("lang_docs"), col("lang_tokens"),
        col("capacity"), col("alloc_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy("lang")
  }
}
