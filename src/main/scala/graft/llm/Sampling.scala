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
    df.where(bucket < (rate * 10000.0).cast("long"))
  }
}
