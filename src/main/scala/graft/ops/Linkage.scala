package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969, "A Theory for
  * Record Linkage"; the Newcombe 1959 weights): candidate pairs from
  * equi-joined blocking keys, scored by the sum of per-field log-odds —
  * log2(m/u) when a field agrees, log2((1-m)/(1-u)) when it disagrees,
  * where m = P(agree | match) and u = P(agree | non-match) — and decided
  * against a threshold. The reference architecture for joining records
  * that lack a shared key (customer files, CRM dedup, census linkage).
  *
  * Design choices for a 100 TB engine:
  *
  *  - weights are INTEGER MILLI-BITS supplied by the caller (computed
  *    once from m/u estimates, never evaluated as floating log at row
  *    scope): the score is a pure integer sum — bit-identical
  *    cross-engine and safely comparable against the threshold with no
  *    ulp hazard at the decision boundary;
  *  - blocking is MULTI-PASS (union of equi-joins): each corruption mode
  *    a field can suffer should leave at least one blocking key intact —
  *    recall comes from the union, cost stays equi-join-shaped. Nothing
  *    here is ever a blocked O(b²) loop over a whole block: every pass
  *    is a hash join on its key, and a hot key is visible as a hot
  *    bucket exactly like the LSH band joins (same skew playbook);
  *  - comparison vectors stay in the output (one boolean per field), so
  *    clerical review / weight re-estimation can consume the same frame.
  */
object Linkage {

  /** One compared field: `agree` is a boolean Column evaluated on the
    * candidate pair frame (caller names its sides, e.g. `a_name` /
    * `b_name`). A NULL agreement (either side null) scores as DISAGREE —
    * the conservative Fellegi-Sunter convention for missing data.
    * Weights are milli-bits: wAgree = round(1000·log2(m/u)),
    * wDisagree = round(1000·log2((1−m)/(1−u))). */
  final case class Field(label: String, agree: Column,
                         wAgree: Long, wDisagree: Long)

  /** Multi-pass blocked candidates: one equi-join per (aKey, bKey)
    * blocking pass, unioned and de-duplicated. `a` and `b` must have
    * disjoint column names (prefix convention: `a_*` + `id_a`, `b_*` +
    * `id_b`); keys are expressions over the respective side. The
    * distinct collapses pairs caught by several passes, keyed by the
    * full row (ids + fields), so downstream scoring sees each candidate
    * once. */
  def blockedCandidates(a: DataFrame, b: DataFrame,
                        keys: Seq[(Column, Column)]): DataFrame = {
    require(keys.nonEmpty, "at least one blocking pass")
    keys.map { case (ka, kb) =>
      a.withColumn("_bk", ka)
        .join(b.withColumn("_bk", kb), "_bk")
        .drop("_bk")
    }.reduce(_ unionByName _).distinct()
  }

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo 1995,
    * "The merge/purge problem for large databases"): sort the merged
    * file by a key and emit every record pair within `w` positions —
    * the OTHER classic blocking method, catching corruptions that
    * perturb a key's low-order digits (a ±1 cent bump lands adjacent in
    * the sort where an equi-block would split).
    *
    * Distributed shape: positions come from
    * [[graft.llm.Sampling.globalRankDesc]]'s two-phase bin machinery
    * (never a global window); a pair within w spans at most two
    * consecutive w-sized rank blocks, so candidates are ONE equi-join
    * of each block against itself and its predecessor with the |Δ| < w
    * filter — O(n·w) pairs total, no sort-merge pass and no window
    * over the merged file.
    *
    * Output: (id_a, id_b, rank_a, rank_b) with rank_b > rank_a; the
    * caller joins payloads back and scores (e.g.
    * [[fellegiSunter]]). `bin` must be a monotone non-decreasing
    * coarsening of `sortKey` (the [[graft.llm.Sampling.globalRankDesc]]
    * contract). */
  def sortedNeighborhood(recs: DataFrame, idCol: Column, sortKey: Column,
                         bin: Column, w: Int): DataFrame = {
    require(w >= 2, "a neighborhood needs w >= 2")
    val pos = graft.llm.Sampling.globalRankDesc(recs, sortKey, bin, idCol)
      .withColumn("blk", expr(s"rank div $w"))
    val left = pos.select(col("id").as("id_a"), col("rank").as("rank_a"),
      col("blk"))
    val right0 = pos.select(col("id").as("id_b"), col("rank").as("rank_b"),
      col("blk"))
    val right = right0.unionByName(
      right0.withColumn("blk", col("blk") - 1))
    left.join(right, "blk")
      .where(col("rank_b") > col("rank_a") &&
        col("rank_b") - col("rank_a") < w)
      .select("id_a", "id_b", "rank_a", "rank_b")
      .distinct()
  }

  /** Score candidate pairs: adds one `agree_<label>` boolean per field,
    * the integer `score_milli` sum, and the `matched` decision. Pure
    * per-row Column work — whole-stage codegen, no shuffle. */
  def fellegiSunter(cand: DataFrame, fields: Seq[Field],
                    threshold: Long): DataFrame = {
    require(fields.nonEmpty, "at least one compared field")
    val withAgree = fields.foldLeft(cand) { (df, f) =>
      // coalesce(false): null-in-either-side agreement counts as disagree
      df.withColumn(s"agree_${f.label}", coalesce(f.agree, lit(false)))
    }
    val score = fields.map { f =>
      when(col(s"agree_${f.label}"), lit(f.wAgree)).otherwise(lit(f.wDisagree))
    }.reduce(_ + _)
    withAgree
      .withColumn("score_milli", score.cast("long"))
      .withColumn("matched", col("score_milli") >= threshold)
  }
}
