package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Windows

/** The native bounded-heap top-k operator vs the window formulation. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$Sf0001/orders.parquet")

  test("native top-k == window top-k on orders (with tie-breaker)") {
    val native = TopKPerKey(orders, Seq("o_custkey"),
        Seq(TopKPerKey.SortKey("o_totalprice", asc = false),
            TopKPerKey.SortKey("o_orderkey")), k = 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val window = Windows.topKPerKey(orders, Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
      .select(col("o_custkey"), col("rn").cast("long"), col("o_orderkey"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("k larger than group size returns whole group ranked") {
    val df = Seq((1, 10), (1, 30), (2, 5)).toDF("k", "v")
    val out = TopKPerKey(df, Seq("k"),
      Seq(TopKPerKey.SortKey("v", asc = false)), k = 10)
      .select("k", "rn", "v").as[(Int, Long, Int)].collect().toSet
    assert(out == Set((1, 1L, 30), (1, 2L, 10), (2, 1L, 5)))
  }

  test("plan contains partial and final TopKPerKeyExec with one exchange") {
    val df = TopKPerKey(orders, Seq("o_custkey"),
      Seq(TopKPerKey.SortKey("o_totalprice", asc = false),
          TopKPerKey.SortKey("o_orderkey")), k = 3)
    df.collect() // force execution so AQE finalizes the plan
    // SparkPlan.nodeName strips the Exec suffix — the node prints as
    // "TopKPerKey" (partial) and "TopKPerKey" (final)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("Exchange"), plan)
  }
}
