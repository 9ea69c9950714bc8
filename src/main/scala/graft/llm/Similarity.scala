package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.CosineSim

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths (SURVEY.md §7.3 step 6):
  *  - brute-force cosine top-k — exact baseline; the query side is
  *    broadcast so the corpus streams once with no shuffle;
  *  - random-hyperplane LSH bucketing — the scale path: candidates share a
  *    signature bucket, so comparisons ~ bucket size, not corpus size.
  */
object Similarity {

  /** Cosine via the codegen'd native expression ([[CosineSim]]). */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine composed from higher-order functions — the no-custom-code
    * baseline formulation (zip_with dot product + aggregate norms). */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact brute-force top-k neighbors for each query vector. The query set
    * is expected to be small (it is broadcast); the corpus side never
    * shuffles — each task ranks its partition and the per-query top-k merge
    * happens in the window over (queries × k) rows. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }

  /** Random-hyperplane LSH signature: `planes` sign bits, plane weights
    * derived deterministically from xxhash64(plane, dim) — reproducible
    * across runs/executors with no driver-side randomness. */
  def lshSignature(emb: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, d) => x.cast("double") *
            ((xxhash64(lit(p), d) % 1000L).cast("double") / 500.0 - 1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** ANN via LSH bucketing: exact cosine only within matching signature
    * buckets, then per-query top-k. Recall < 1 by construction; the recall
    * vs brute force is asserted in tests. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Int = 12): DataFrame = {
    // cache: the signed corpus is consumed twice (query lookup + candidate
    // scan) — without this the 12-plane projection is computed twice
    val sigd = corpus.withColumn("sig", lshSignature(col("embedding"), planes))
      .cache()
    val q = sigd.join(
        broadcast(queries.select(col("vec_id").as("query_id"))),
        col("vec_id") === col("query_id"))
      .select(col("query_id"), col("embedding").as("q_emb"),
        col("sig").as("q_sig"))
    val cand = sigd.join(broadcast(q),
      col("sig") === col("q_sig") && col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }
}
