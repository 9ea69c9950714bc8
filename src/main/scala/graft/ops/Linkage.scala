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
