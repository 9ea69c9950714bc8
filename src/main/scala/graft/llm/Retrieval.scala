package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse (lexical) retrieval over the document corpus — the BM25
  * ranking function (Robertson et al., TREC-3; the Lucene/Okapi default)
  * as a Spark-native top-k search.
  *
  * The engine shape is production inverted-index search re-expressed
  * relationally:
  *
  *   - postings (doc_id, term, tf), per-doc lengths, per-term df and the
  *     corpus stats are corpus-linear aggregates — the "index build"
  *     pass, persistable as bucketed tables ([[writeBm25Index]], the
  *     q129/q142 build-once/search-every-batch lifecycle);
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

  /** The index-build aggregates: (postings, dl, df, stats). */
  private def buildIndex(docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("dl"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("sum_dl"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    (tf, dl, df_, stats)
  }

  /** The search pass over (possibly reloaded) index frames. */
  private def score(tf: DataFrame, dl: DataFrame, df_ : DataFrame,
                    stats: DataFrame, queries: DataFrame, k: Int,
                    k1: Double, b: Double): DataFrame = {
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

  /** Top-`k` documents per query by BM25, index built in-query.
    *
    * `queries`: (query_id: long, qterms: array&lt;string&gt;) — small.
    * Returns (query_id, rk, doc_id, hits, score): rank, number of distinct
    * query terms matched, and the BM25 score rounded to 4 decimals. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 5,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (tf, dl, df_, stats) = buildIndex(docs)
    score(tf, dl, df_, stats, queries, k, k1, b)
  }

  /** PERSIST the BM25 index as bucketed tables — the
    * build-once/search-every-batch lifecycle (the q129 signature-index /
    * q142 IVF-index story for lexical search): postings and df bucketed +
    * sorted by TERM so the query-term probe reads matching buckets with
    * no exchange on the index side; doc lengths bucketed by doc_id; the
    * 1-row stats frame plain. Table names: `<name>_postings`,
    * `<name>_df`, `<name>_dl`, `<name>_stats`. */
  def writeBm25Index(docs: DataFrame, name: String,
                     numBuckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    // same catalog hygiene as Dedup.writeSignatureIndex: drop a stale
    // catalog entry AND its surviving warehouse directory
    Seq(s"${name}_postings", s"${name}_df", s"${name}_dl",
      s"${name}_stats").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tbl.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val (tf, dl, df_, stats) = buildIndex(docs)
    // repartition on the bucket key before each bucketed write — writer
    // tasks then own whole buckets and emit one file per bucket instead
    // of numBuckets x parallelism small files (guide §6)
    tf.repartition(numBuckets, col("term"))
      .write.mode("overwrite").bucketBy(numBuckets, "term").sortBy("term")
      .saveAsTable(s"${name}_postings")
    df_.repartition(numBuckets, col("term"))
      .write.mode("overwrite").bucketBy(numBuckets, "term").sortBy("term")
      .saveAsTable(s"${name}_df")
    dl.repartition(numBuckets, col("doc_id"))
      .write.mode("overwrite").bucketBy(numBuckets, "doc_id")
      .sortBy("doc_id").saveAsTable(s"${name}_dl")
    stats.write.mode("overwrite").saveAsTable(s"${name}_stats")
  }

  /** [[bm25TopK]] against a PERSISTED index (see [[writeBm25Index]]):
    * only the query terms are computed per batch; every corpus-scale
    * frame is the bucketed tables. Output is bit-identical to the
    * in-query form on the same corpus (asserted in RetrievalSpec; the
    * q171 oracle is q166's verbatim). */
  def bm25SearchIndexed(spark: SparkSession, queries: DataFrame,
                        name: String, k: Int = 5, k1: Double = 1.2,
                        b: Double = 0.75): DataFrame =
    score(spark.table(s"${name}_postings"), spark.table(s"${name}_dl"),
      spark.table(s"${name}_df"), spark.table(s"${name}_stats"),
      queries, k, k1, b)
}
