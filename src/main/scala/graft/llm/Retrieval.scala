package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse (lexical) retrieval over the document corpus — the BM25
  * ranking function (Robertson et al., TREC-3; the Lucene/Okapi default)
  * as a Spark-native top-k search.
  *
  * The engine shape is production inverted-index search re-expressed
  * relationally:
  *
  *   - postings (doc_id, term, tf) and per-doc lengths are corpus-linear
  *     aggregates — the "index build" pass, persistable exactly like the
  *     q129 signature index;
  *   - the query set is SMALL (it is search): its term list broadcasts,
  *     so the candidate join prunes the postings at the scan and only
  *     matching postings ever shuffle;
  *   - per-(query, doc) scores are INTEGER sums of fixed-point per-term
  *     contributions (round(contrib·10⁶) as long) — integer addition is
  *     order-free, so the score is bit-identical in any engine / any
  *     partitioning, the q121/q122 convention. The only transcendental
  *     (the idf ln) is computed per TERM, not per pair, and rounds into
  *     the fixed point the same way on both sides;
  *   - ranking is a per-query top-k on the ROUNDED score with doc_id
  *     tie-break (bounded-heap shape at scale).
  *
  * The Lucene `ln(1 + (N - df + 0.5)/(df + 0.5))` idf form keeps every
  * contribution non-negative, so HALF_UP and half-away-from-zero rounding
  * agree cross-engine. */
object Retrieval {

  /** Top-`k` documents per query by BM25.
    *
    * `queries`: (query_id: long, qterms: array&lt;string&gt;) — small.
    * Returns (query_id, rk, doc_id, hits, score): rank, number of distinct
    * query terms matched, and the BM25 score rounded to 4 decimals. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 5,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("sum_dl"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qterm = queries
      .select(col("query_id"), explode(col("qterms")).as("term")).distinct()
    // candidate postings: broadcast the (small) query-term list so the
    // prune happens AT the postings scan — non-matching docs never shuffle
    val cand = tf.join(broadcast(qterm), "term")
      .join(df_, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
    // fixed-point per-term contribution; the arithmetic tree is spelled
    // identically in the oracle SQL (left-associative, same literals)
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") * col("n_docs") / col("sum_dl"))
    val contribFp =
      round(idf * (col("tf") * lit(k1 + 1.0)) / denom * lit(1e6), 0)
        .cast("long")
    val scored = cand.select(col("query_id"), col("doc_id"),
        contribFp.as("c"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("c")).as("score_fp"), count(lit(1)).as("hits"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_fp").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("doc_id"), col("hits"),
        round(col("score_fp") / lit(1e6), 4).as("score"))
  }
}
