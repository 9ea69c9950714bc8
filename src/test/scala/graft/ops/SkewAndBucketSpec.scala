package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Tables

/** Scale machinery: salted skew joins (result-equal to the plain join) and
  * bucketed tables (co-located join with no shuffle exchange). */
class SkewAndBucketSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join on skewed data") {
    // heavy tail: one hot key with 10k rows
    val left = (Seq.fill(10000)(1L) ++ (2L to 100L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val right = (1L to 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().toSeq.sorted
    val salted = Skew.saltedJoin(left, right, "k",
        saltSource = Seq("payload"), saltFactor = 8)
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().toSeq.sorted
    assert(salted == plain)
    assert(salted.size == 10000 + 99)
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored). The in-memory catalog forgets tables across JVMs but
    // the directories persist — remove both for idempotence.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Seq("b_orders", "b_customer").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    Tables.table(spark, Sf0001, "orders")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.table(spark, Sf0001, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    // disable auto-broadcast so the join would otherwise shuffle
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 1500L)
    }
  }

  private def withConf(key: String, value: String)(body: => Unit): Unit = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
