package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.{Dedup, SeededHash, TextAnalysis, XxSeededHash}

/** ONLINE near-duplicate detection: MinHash-LSH bucket state maintained
  * inside a Structured Streaming query, so a corpus INGEST pipeline can
  * flag probable near-dups of anything seen before — without waiting for
  * the batch dedup pass (q32/q63) to re-mine the whole corpus.
  *
  * Design points:
  *
  *  - **Per-row signatures, no pre-shuffle.** The MinHash signature is
  *    computed per document in ONE compiled pass
  *    ([[graft.functions.ShingleMinHash]]: tokens → k seeded mins)
  *    instead of the batch path's explode + groupBy-min — value-identical
  *    (min over the same multiset; HOF-parity asserted per hash family in
  *    StreamingNearDupSpec), and it keeps the stream stateless until the
  *    single keyed stateful operator.
  *
  *  - **Min-keeper semantics, precisely stated.** Bucket state is the
  *    MINIMUM doc_id ever seen in that (band, bucket); a document "hits"
  *    in a band iff a smaller doc_id shares the bucket in the SAME or an
  *    EARLIER micro-batch. Within a micro-batch the outcome is
  *    independent of row order and task scheduling (the whole group
  *    folds to one min — an "arrival-first" rule would not be testable).
  *    Across batches the flag equals the relational restatement
  *    ("exists a smaller doc_id in the bucket") whenever ids are
  *    non-decreasing in arrival order — the natural ingest case, ids
  *    assigned at arrival — and in the single-batch file replay the gate
  *    runs; a pair whose LARGER id arrived in a strictly earlier batch
  *    degrades to a MISS (append mode cannot retract the already-emitted
  *    row), never to a false flag. Asserted in StreamingNearDupSpec.
  *
  *  - **Scale shape.** One shuffle per micro-batch on (band, bucket) —
  *    the LSH equi-join key — and O(1) state (one long) per distinct
  *    bucket; the NUMBER of distinct buckets grows with corpus history,
  *    so a long-running ingest passes `stateTtl` to [[detect]] to evict
  *    idle buckets and bound total state (see its scaladoc for the
  *    recall trade). A degenerate bucket concentrates its documents in one
  *    group per batch; the `maxBucket`-style cap is not needed for the
  *    state (which stays one long regardless) but a flood still skews
  *    the group — collapse exact duplicates upstream first
  *    (`EventsStream.dedupWithinWatermark` / q93), mirroring the batch
  *    pipeline contract.
  *
  * Output: one row per (doc_id, band) with the hit flag; aggregate
  * `sum(dup)` per doc for a per-document candidate score (0..bands).
  * Bucket-collision candidates are PROBABLE near-dups (same trade as
  * q32's bands); verify exactly downstream where it matters.
  */
object StreamingNearDup {

  case class BandRow(doc_id: Long, band: Int, bucket: String)
  case class BandHit(doc_id: Long, band: Int, dup: Boolean)

  /** Per-document LSH band buckets, computed per row (see scaladoc).
    * Documents with fewer than `n` tokens carry no shingles and are
    * dropped — the batch family's `len(ws) >= n` contract.
    *
    * The signature is ONE compiled pass per row
    * ([[graft.functions.ShingleMinHash]] — tokens → k seeded mins,
    * shingle strings never materialized for the md5 family). The HOF
    * spelling it replaced (`array_min(transform(...))` over interpreted
    * per-shingle hash lambdas) measured ~7 s of the detector's ~10 s at
    * sf0.1 and survives only as `sigHof`, the parity witness. */
  def bandBuckets(docs: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 4,
                  hasher: SeededHash = XxSeededHash): DataFrame = {
    require(k % bands == 0, "k must split evenly into bands")
    // exhaustive over the sealed family — a third SeededHash would need
    // its own compiled replica in ShingleMinHash, and this match makes
    // that a compile error, not a silent xx64 fallback
    val md5Family = hasher match {
      case graft.llm.PortableSeededHash => true
      case graft.llm.XxSeededHash => false
    }
    val sigArr = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.ShingleMinHash(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          TextAnalysis.tokens(col("text"))), n, k, md5Family))
    val sig = docs.select(col("doc_id"), sigArr.as("mhs"))
      .where(col("mhs").isNotNull)
      .select(col("doc_id") +:
        (0 until k).map(i => element_at(col("mhs"), i + 1).as(s"mh$i")): _*)
    val rpb = k / bands
    // one pass: explode an array of (band, bucket) structs instead of a
    // bands-way self-union — a streaming union re-executes the source
    // (and the interpreted per-row signatures) once per branch, which
    // measured ~4× the whole query's cost
    val bb = array((0 until bands).map { b =>
      val cols = (b * rpb until (b + 1) * rpb)
        .map(i => col(s"mh$i").cast("string"))
      struct(lit(b).as("band"), concat_ws(",", cols: _*).as("bucket"))
    }: _*)
    sig.select(col("doc_id"), explode(bb).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  /** The higher-order-function formulation of the per-row signature —
    * kept ONLY as the parity witness for [[graft.functions.ShingleMinHash]]
    * (asserted per hash family in StreamingNearDupSpec); interpreted
    * lambdas make it several times slower than the compiled pass. */
  private[graft] def sigHof(docs: DataFrame, n: Int, k: Int,
                            hasher: SeededHash): DataFrame = {
    val hb = transform(
      TextAnalysis.distinctShinglesFromTokens(
        TextAnalysis.tokens(col("text")), n),
      s => pmod(hasher.hash(s, 0), lit(Dedup.P31)))
    docs.select(col("doc_id"), hb.as("hb"))
      .where(size(col("hb")) >= 1)
      .select(col("doc_id"), array((0 until k).map { i =>
        array_min(transform(col("hb"),
          x => (x * (2 * i + 1) + Dedup.bSeed(i)) % Dedup.P31))
      }: _*).as("mhs"))
  }

  /** The stateful detector: works on a STREAMING frame (state persists
    * across micro-batches in the state store) and, with identical
    * results, on a batch frame (every group sees all its rows against
    * empty state — the min-keeper outcome is the same by design).
    *
    * `stateTtl` bounds state for a LONG-RUNNING ingest: without it, one
    * state entry per distinct (band, bucket) accumulates forever — at
    * 100 TB that is effectively one entry per distinct document region,
    * unbounded. With a TTL, a bucket idle for the duration is evicted
    * (processing-time timeout), so state size tracks the ACTIVE working
    * set instead of history. The trade is recall, stated precisely: a
    * near-dup arriving more than `stateTtl` after the last activity in
    * its bucket is scored against a fresh bucket — a MISS, never a false
    * flag (identical to the cross-batch larger-id-first degradation
    * already documented above). Each batch's activity re-arms the
    * bucket's timer. Batch execution ignores timeouts (no clock), so
    * TTL-on and TTL-off are identical in batch mode — the gate's
    * single-replay oracle stays exact; eviction itself is a wall-clock
    * behavior exercised only by a genuinely idle stream.
    *
    * Caller contract with TTL set: `ProcessingTimeTimeout` makes
    * `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` return true
    * after EVERY batch (the engine keeps waking to evaluate timeouts),
    * so `StreamingQuery.processAllAvailable()` NEVER returns — its
    * `noNewData` latch can't set. A long-running ingest (the TTL's
    * audience) lives on `awaitTermination`; tests poll the sink. */
  def detect(spark: SparkSession, docs: DataFrame, n: Int = 3, k: Int = 16,
             bands: Int = 4,
             hasher: SeededHash = XxSeededHash,
             stateTtl: Option[java.time.Duration] = None): Dataset[BandHit] = {
    import spark.implicits._
    val timeout = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    bandBuckets(docs, n, k, bands, hasher).as[BandRow]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[Long, BandHit](
        OutputMode.Append(), timeout) {
        (key: (Int, String), rows: Iterator[BandRow],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // idle bucket: evict. rows is empty on a timeout invocation.
            state.remove()
            Iterator.empty
          } else {
            val ids = rows.map(_.doc_id).toArray
            var mn = state.getOption.getOrElse(Long.MaxValue)
            var i = 0
            while (i < ids.length) { if (ids(i) < mn) mn = ids(i); i += 1 }
            state.update(mn)
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            val keeper = mn
            ids.iterator.map(id => BandHit(id, key._1, id > keeper))
          }
      }
  }
}
