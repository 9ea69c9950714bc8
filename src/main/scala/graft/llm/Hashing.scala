package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded hash families for the LSH operators (MinHash, SimHash, random
  * hyperplanes). The LSH *structure* — banding, bucket equi-joins,
  * candidate verification — is hash-agnostic; only the leaf hash differs,
  * so it is a parameter:
  *
  *  - [[XxSeededHash]] — `xxhash64`, the production default: fastest
  *    (codegen'd native), full 64-bit spread, but engine-specific, so
  *    results can only be rows-checked against another engine.
  *  - [[PortableSeededHash]] — the top 60 bits of `md5("<seed>:" || x)`:
  *    bit-identical in any engine with md5 (DuckDB:
  *    `('0x' || substr(md5(seed || ':' || x), 1, 15))::BIGINT`), which
  *    makes MinHash signatures, band buckets, SimHash bits and LSH plane
  *    weights oracle-checkable end-to-end. ~10× more cycles per hash than
  *    xxhash64 — the correctness-gate twin, not the 100 TB path.
  *
  * Both produce values deterministic across runs, partitions and
  * executors (no driver-side randomness to ship).
  *
  * SEALED: the compiled per-row signature path
  * ([[graft.functions.ShingleMinHash]]) replicates each family's exact
  * byte-level hash fold — a third family would need its own compiled
  * replica, so adding one is a compile-time decision (the dispatch in
  * [[graft.streaming.StreamingNearDup.bandBuckets]] is an exhaustive
  * match), never a silent fallback.
  */
sealed trait SeededHash {
  /** Non-negative-or-full-range 64-bit hash of `c` under `seed`. Values for
    * different seeds are independent; equal inputs hash equal. */
  def hash(c: Column, seed: Int): Column
  def name: String
}

/** Engine-fast seeded hash (production default at scale). */
object XxSeededHash extends SeededHash {
  override def hash(c: Column, seed: Int): Column = xxhash64(lit(seed), c)
  override def name: String = "xx64"
}

/** Cross-engine seeded hash: first 15 hex chars of md5 → 60-bit long.
  * Always non-negative (< 2^60). Computed by the native
  * [[graft.functions.Md5Prefix60]] expression — same value as the
  * `conv(substring(md5(...), 1, 15), 16, 10)` SQL spelling (property-
  * tested), without the per-row hex-string round-trip. */
object PortableSeededHash extends SeededHash {
  override def hash(c: Column, seed: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.Md5Prefix60(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          concat(lit(s"$seed:"), c.cast("string")))))
  override def name: String = "md5"

  /** The DuckDB spelling of [[hash]] for oracle-SQL generation. `x` must be
    * a SQL expression of VARCHAR type (cast numerics with `::VARCHAR`). */
  def sql(x: String, seed: Int): String =
    s"('0x' || substr(md5('$seed:' || $x), 1, 15))::BIGINT"
}
