package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build a larger documents corpus from a testdata scale factor for scale
  * benchmarking: `runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <copies>`.
  *
  * Each copy k suffixes every token with `_c<k>` (copy 0 stays verbatim),
  * so the copies have DISJOINT vocabularies: the source's exact-dup and
  * near-dup structure replicates proportionally (each planted dup group
  * exists once per copy), shingle document frequencies stay at their
  * source values, and LSH bucket sizes stay constant — i.e. a 10-copy run
  * models a corpus 10× the size with the same duplication FRACTION, which
  * is the regime the dedup operators' near-linear scaling claims are
  * about. (A real 10× crawl would also share vocabulary across shards —
  * df growth is benchmarked separately by the hot-shingle/hot-bucket cap
  * tests, which model exactly that degeneracy.)
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1); val copies = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val c = spark.range(copies).select(col("id").as("copy"))
    val toks = split(col("text"), " ")
    val suffixed = array_join(
      transform(toks, t => concat(t, lit("_c"), col("copy"))), " ")
    docs.crossJoin(c)
      .select(
        (col("doc_id") + col("copy") * 100000L).as("doc_id"),
        when(col("copy") === 0, col("text")).otherwise(suffixed).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    println(s"[scaleup] wrote ${copies}x ${docs.count()} docs to $dst")
    spark.stop()
  }
}
