package graft

import org.apache.spark.sql.SparkSession

/** The production session recipe — what a cluster deployment of this
  * library should enable, packaged so "switch from the reference" is one
  * call instead of a conf scavenger hunt. Everything here is a plain
  * public Spark conf; nothing is magic:
  *
  *  - **AQE + skew-join split**: runtime re-planning converts sort-merge
  *    to broadcast when a side turns out small, coalesces
  *    shuffle partitions, and splits skewed join partitions — the
  *    complement to the engine's own skew caps (the caps bound
  *    SINGLE-KEY work, which AQE cannot split below one key;
  *    `tools.CapFlood` measures why that matters).
  *  - **Runtime bloom-filter join pruning**: semi-join reduction for the
  *    fact-fact joins (q03/q23-shape) at 100 TB.
  *  - **V2 bucketing (storage-partitioned joins)**: snapshot tables
  *    partitioned on the same key join — and aggregate on that key —
  *    with zero shuffle exchanges (the scan reports
  *    `KeyGroupedPartitioning` from manifest bytes).
  *  - **RocksDB state store**: bounded-memory streaming state — the
  *    provider the gated stream queries (q83/q85) run on.
  *  - **Extension registration**: the native expressions
  *    (`poly_hash`, `cosine_sim`, `map_count`, `md5_prefix60`,
  *    `misra_gries`), the TopK rewrite + physical operator, and the
  *    (conf-gated, default-off) ANN bucket-join rewrite.
  *
  * Shuffle-partition count is deliberately NOT set here: it is a
  * cluster-size decision (rule of thumb: 2-3× total executor cores;
  * with AQE coalescing, err high). The local harness mains set it
  * explicitly (32 for local[32]).
  */
object GraftSession {

  /** Apply the recommended production confs to a builder. */
  def recommended(builder: SparkSession.Builder): SparkSession.Builder =
    builder
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE inside cached plans: without it every .persist() freezes its
      // shuffles at the static partition count and each stage over the
      // cache inherits that task count whatever the cached data's size —
      // wrong in both directions at scale (a vocab-sized round frame
      // fans 1000s of empty tasks; a skewed cached join never splits).
      // The default is false only to keep cache output partitioning
      // stable for consumers that depend on it; nothing here does
      // (EnsureRequirements re-establishes any needed distribution).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // storage-partitioned joins: a DSv2 scan reporting
      // KeyGroupedPartitioning (the snapshot source over a partitioned
      // table) joins/aggregates on its partition key with no exchange
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .config("spark.sql.session.timeZone", "UTC")

  /** Build the session and register the engine's functions, rules and
    * strategy on it (idempotent — safe on a shared session). */
  def build(builder: SparkSession.Builder): SparkSession = {
    val spark = recommended(builder).getOrCreate()
    GraftFunctions.register(spark)
    graft.plans.GraftRules.register(spark)
    spark
  }
}
