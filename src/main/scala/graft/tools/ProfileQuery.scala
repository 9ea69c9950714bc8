package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query wall-clock decomposition for optimization work: runs a
  * registered query (same session config as [[graft.Bench]]) and prints,
  * per sample, the number of Spark jobs, stages and tasks it scheduled,
  * the summed executor task time, and the share of wall-clock NOT covered
  * by any running job (driver-side planning/analysis/AQE re-optimization
  * — the overhead that plan-shape work cannot touch but plan-size work
  * can). This is the guide-§1 "where is the time going" instrument for
  * the local bench regime, where a 60-Exchange plan can spend more time
  * being PLANNED than being RUN.
  *
  * `runMain graft.tools.ProfileQuery <sfDir> <runs> <query...>`
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark)
    graft.plans.GraftRules.register(spark)

    // listener state: job windows (for busy-time coverage) + stage sums
    val jobWindows = mutable.ArrayBuffer[(Long, Long)]() // (start, end) ms
    val jobStarts = mutable.Map[Int, Long]()
    @volatile var nJobs = 0
    @volatile var nStages = 0
    @volatile var nTasks = 0L
    @volatile var taskTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        synchronized { jobStarts(e.jobId) = e.time; nJobs += 1 }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        synchronized {
          jobStarts.remove(e.jobId).foreach(s => jobWindows += ((s, e.time)))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        synchronized {
          nStages += 1
          nTasks += e.stageInfo.numTasks
          taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
          shuffleReadB += e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
          shuffleWriteB += e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def busyMs(windows: Seq[(Long, Long)]): Long = {
      // union of [start,end) job intervals — overlapping concurrent jobs
      // count once
      val sorted = windows.sortBy(_._1)
      var total = 0L; var curS = Long.MinValue; var curE = Long.MinValue
      sorted.foreach { case (s, e) =>
        if (s > curE) { total += math.max(0L, curE - curS); curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      total + math.max(0L, curE - curS)
    }

    def runOne(name: String): Unit = {
      spark.catalog.clearCache()
      synchronized {
        jobWindows.clear(); jobStarts.clear()
        nJobs = 0; nStages = 0; nTasks = 0; taskTimeMs = 0
        shuffleReadB = 0; shuffleWriteB = 0
      }
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1e6
      // drain listener events before reading the counters (the bus is
      // private[spark]; a short settle loop is enough for a tool)
      Thread.sleep(300)
      val busy = busyMs(jobWindows.toSeq)
      println(f"[profile] $name wall=${wallMs / 1000}%.2fs " +
        f"jobs=$nJobs stages=$nStages tasks=$nTasks " +
        f"taskTime=${taskTimeMs / 1000.0}%.1fs " +
        f"jobBusy=${busy / 1000.0}%.2fs driverGap=${(wallMs - busy) / 1000.0}%.2fs " +
        f"shufR=${shuffleReadB / 1048576.0}%.1fMB shufW=${shuffleWriteB / 1048576.0}%.1fMB")
    }

    runOne(names.head) // warmup
    names.foreach { n => (0 until runs).foreach(_ => runOne(n)) }
    spark.stop()
  }
}
