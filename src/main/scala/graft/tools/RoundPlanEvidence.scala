package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-off generator for plans/r16 round-plan evidence: iterative
  * trainers execute their rounds during query CONSTRUCTION, so the
  * registered queries' explain dumps only show the final checkpointed
  * output — this prints the ROUND plan itself, for the round-15-layout
  * ("before": exploded frame localCheckpointed unpartitioned, the
  * per-round dot groupBy / norm join / argmax re-exchange it) and the
  * round-16 layout ("after": corpus hash-partitioned on vec_id and
  * persisted; rounds reuse the one exchange). Throwaway tool — kept only
  * for regenerating the committed evidence files. */
object RoundPlanEvidence {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.register(spark)
    graft.plans.GraftRules.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def roundPlan(ex: DataFrame, nx: DataFrame): String = {
      val seeds = emb
        .select(col("vec_id").as("cid"))
        .orderBy(graft.llm.XxSeededHash.hash(col("cid"), 5).asc,
          col("cid").asc)
        .limit(8)
      val cent = ex.join(seeds, col("vec_id") === col("cid"))
        .select(col("cid"), col("d"), col("xi").as("m"))
        .localCheckpoint()
      val nm = cent.groupBy("cid").agg(sum(col("m") * col("m")).as("nm"))
      val wA = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))
      ex.join(broadcast(cent), "d")
        .groupBy("vec_id", "cid").agg(sum(col("xi") * col("m")).as("dot"))
        .join(broadcast(nm), "cid")
        .join(nx, "vec_id")
        .withColumn("sim", round(col("dot").cast("double") /
          (sqrt(col("nx").cast("double")) * sqrt(col("nm").cast("double"))),
          4))
        .withColumn("rn", row_number().over(wA))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("cid"))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
    }

    val exploded = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d"),
        round(col("x").cast("double") * 1000).cast("long").as("xi"))

    // BEFORE (round-15 layout): unpartitioned localCheckpoint — under AQE
    // the checkpoint records UnknownPartitioning, so the round plan
    // exchanges the dot frame, the nx join, and the argmax
    val exB = exploded.localCheckpoint()
    val nxB = exB.groupBy("vec_id")
      .agg(sum(col("xi") * col("xi")).as("nx")).localCheckpoint()
    val before = roundPlan(exB, nxB)

    // AFTER (round-16 layout): hash(vec_id) repartition + persist — the
    // cached plan keeps its partitioning; the round runs on it end to end
    val exA = emb.repartition(col("vec_id"))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d"),
        round(col("x").cast("double") * 1000).cast("long").as("xi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nxA = exA.groupBy("vec_id")
      .agg(sum(col("xi") * col("xi")).as("nx"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    exA.count(); nxA.count()
    val after = roundPlan(exA, nxA)

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r16/kmeans_round_before.txt"),
      "## kmeans EM round (round-15 layout: unpartitioned localCheckpoint)\n\n" +
        before)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r16/kmeans_round_after.txt"),
      "## kmeans EM round (round-16 layout: hash(vec_id) persisted corpus)\n\n" +
        after)
    println("wrote plans/r16/kmeans_round_{before,after}.txt")
    spark.stop()
  }
}
