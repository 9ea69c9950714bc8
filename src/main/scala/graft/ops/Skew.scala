package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (SURVEY.md §4 / builder-prompt: "skewed keys → salting or AQE
  * skew-join"). AQE's skew-join split handles sort-merge joins
  * automatically; explicit salting is the fallback for cases AQE can't
  * split (e.g. a hot key on the build side of a hash join, or pre-AQE
  * shuffle sizing), and documents the technique as a first-class op.
  */
object Skew {

  /** Salted inner equi-join on `key`: the left (skewed) side gets a random
    * salt in [0, saltFactor); the right side is replicated saltFactor
    * times; the join key becomes (key, salt), spreading each hot key over
    * saltFactor reducers.
    *
    * Deterministic salting: the salt is derived from xxhash64 of the
    * left row's salt-source columns (not rand()), so retries/speculative
    * tasks produce identical output. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: Seq[String], saltFactor: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(saltSource.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
