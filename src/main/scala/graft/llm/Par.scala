package graft.llm

import org.apache.spark.sql.DataFrame

/** Scan fan-out for per-row-heavy legs. A brute-force scoring pass
  * (q34/q47-family cosines, the codec chains) streams the corpus side
  * through a broadcast join or mapPartitions with NO exchange before it —
  * so its parallelism is the SCAN's, and a small or compacted corpus
  * (the bench parquet is one row group = one split) runs the whole
  * compute serially while every other core idles (guide §2.5, the
  * unsplittable-input case). Repartitioning before such a leg is cheap
  * relative to the per-row work it parallelizes, and the
  * `max(current, cores)` guard makes it a no-op on an input that is
  * already at least core-parallel — i.e. on any real 100 TB scan. */
object Par {

  /** Round-robin the frame to `defaultParallelism` partitions when it
    * currently has fewer; untouched otherwise (and for streaming frames,
    * whose parallelism belongs to the micro-batch planner).
    *
    * The partition probe (`.rdd.getNumPartitions`) is only free on a
    * scan-shaped plan; on a plan containing joins/aggregates it would
    * EXECUTE those stages eagerly (AQE materializes query stages to
    * answer it) and the work would not be reused by the real query. Such
    * inputs have been through an exchange already — AQE sized them — so
    * they pass through untouched. */
  def fanOutScan(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    import org.apache.spark.sql.catalyst.plans.logical._
    // Union stays probe-safe (a union of scans has no stages to
    // materialize); any member containing a join/aggregate still trips
    // the walk below
    val scanShaped = !df.queryExecution.analyzed.exists {
      case _: Join | _: Aggregate | _: Sort | _: Window => true
      case _: RepartitionOperation | _: GlobalLimit => true
      case _ => false
    }
    if (!scanShaped) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
