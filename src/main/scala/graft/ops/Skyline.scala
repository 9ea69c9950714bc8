package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The SKYLINE operator (Börzsönyi, Kossmann & Stocker 2001, "The
  * Skyline Operator"): the Pareto frontier of a frame under "maximize
  * every metric" — row r survives iff no row is ≥ on all metrics and
  * strictly > on at least one. The multi-objective curation primitive:
  * "show me the documents no other document beats on quality AND
  * diversity AND length" needs no weighting of the axes, where a fused
  * score (q203) must pick one.
  *
  * Distributed shape — the classic two-phase algorithm, NOT an O(n²)
  * self-join: the skyline distributes over unions
  * (sky(A ∪ B) ⊆ sky(A) ∪ sky(B), because a dominating point is itself
  * dominated only by frontier points), so
  *
  *  1. each partition computes its LOCAL skyline in one pass
  *     (mapPartitions — route (d), justified: dominance pruning is
  *     genuinely per-partition imperative state);
  *  2. the union of local skylines — O(log^(k-1) n) expected rows for
  *     k independent metrics, tiny — re-prunes in one final task.
  *
  * Metrics are cast to LONG (callers pre-scale fixed-point doubles and
  * negate to minimize), so dominance is exact integer comparison and
  * the result set is bit-identical cross-engine and
  * partitioning-independent (ties — equal on every metric — are never
  * dominated, so duplicates of a frontier point all survive). */
object Skyline {

  private def dominates(a: Seq[Long], b: Seq[Long]): Boolean = {
    var ge = true; var gt = false; var i = 0
    while (i < a.length && ge) {
      if (a(i) < b(i)) ge = false
      else if (a(i) > b(i)) gt = true
      i += 1
    }
    ge && gt
  }

  private def prune(it: Iterator[(Long, Seq[Long])])
      : Iterator[(Long, Seq[Long])] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    it.foreach { p =>
      if (!kept.exists(q => dominates(q._2, p._2))) {
        val survivors = kept.filterNot(q => dominates(p._2, q._2))
        kept.clear(); kept ++= survivors += p
      }
    }
    kept.iterator
  }

  /** Skyline of `df` maximizing every column of `metrics`; returns
    * (id, m0…m(k−1)) rows of the frontier. */
  def skyline(df: DataFrame, idCol: Column,
              metrics: Seq[Column]): DataFrame = {
    require(metrics.nonEmpty, "skyline needs at least one metric")
    val spark = df.sparkSession
    import spark.implicits._
    val proj: Dataset[(Long, Seq[Long])] = df
      .select(idCol.cast("long").as("id"),
        array(metrics.map(_.cast("long")): _*).as("m"))
      .as[(Long, Seq[Long])]
    val local = proj.mapPartitions(prune)
    // Tree-merge the local skylines instead of funneling their union
    // through one task. The polylog survivor bound only holds for
    // INDEPENDENT metrics — anti-correlated metrics make a local
    // skyline O(partition) rows, so a single final merge task is an
    // OOM/straggler hazard. Each coalesce round merges ≤ fanIn pruned
    // sets per task (coalesce: no shuffle, co-located merge) and
    // re-prunes, so per-task input is fanIn × its children's survivor
    // counts, and log_fanIn(P) rounds reach one task that sees only
    // already-tree-pruned frontier candidates. In the true worst case
    // (every row on the frontier) the root still holds the full
    // skyline — but that is the operator's OUTPUT, not avoidable
    // intermediate state.
    val fanIn = 8
    var merged = local
    var parts = merged.rdd.getNumPartitions
    while (parts > 1) {
      parts = math.max(1, (parts + fanIn - 1) / fanIn)
      merged = merged.coalesce(parts).mapPartitions(prune)
    }
    val sky = merged
    sky.select(col("_1").as("id") +:
      metrics.indices.map(i => col("_2").getItem(i).as(s"m$i")): _*)
  }
}
