package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeSourceSpec extends SparkSpec {
  import spark.implicits._

  private def range(opts: (String, String)*): DataFrame = {
    val r = spark.read.format("graft.sources.RangeSource")
    opts.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load()
  }

  test("full scan produces [start, end) over the requested slices") {
    val df = range("start" -> "10", "end" -> "110", "slices" -> "4")
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.agg(min("id"), max("id")).as[(Long, Long)].head() == ((10L, 109L)))
  }

  test("batch scan is vectorized: ColumnarToRow in plan, values exact") {
    val df = range("start" -> "0", "end" -> "10000", "slices" -> "3")
    df.collect() // force execution so the adaptive plan is final
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"expected columnar scan:\n$plan")
    // values cross the 4096-row batch boundary correctly
    val sums = df.agg(sum("id"), count(lit(1)), sum("bucket"))
      .as[(Long, Long, Long)].head()
    assert(sums == ((9999L * 10000 / 2, 10000L, (0 until 10000).map(_ % 10).sum.toLong)))
  }

  test("id predicates are pushed: scan range narrows") {
    val df = range("end" -> "1000000")
      .where(col("id") >= 999990L && col("id") < 999995L)
    assert(df.select("id").as[Long].collect().toSeq.sorted ==
      (999990L to 999994L))
    // the narrowed range is visible in the scan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lo=999990") && plan.contains("hi=999995"), plan)
  }

  test("residual filters stay with Spark") {
    val df = range("end" -> "100")
      .where(col("id") >= 90L && col("bucket") === 5)
    assert(df.select("id").as[Long].collect().toSeq == Seq(95L))
  }

  test("micro-batch streaming read delivers the full range across batches") {
    val stream = spark.readStream.format("graft.sources.RangeSource")
      .option("start", "0").option("end", "1000")
      .option("rowsPerBatch", "100").option("slices", "2")
      .load()
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("t_rangestream")
      .outputMode("complete").start()
    q.processAllAvailable()
    val batches = q.lastProgress.batchId
    q.stop()
    assert(spark.table("t_rangestream").collect().head.getLong(0) == 1000L)
    assert(batches >= 9, s"expected ~10 micro-batches, got $batches")
  }

  test("column pruning reaches the reader") {
    val df = range("end" -> "50").select("bucket")
    assert(df.distinct().as[Int].collect().toSet == (0 to 9).toSet)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=bucket"), plan)
  }
}
