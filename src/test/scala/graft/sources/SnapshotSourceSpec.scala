package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.io.SnapshotTable

/** The DSv2 read surface over [[SnapshotTable]]: time travel through
  * `spark.read`, manifest-schema null-fill, planning-time stats
  * pruning, and the bare-projection (count(*)) path. */
class SnapshotSourceSpec extends SparkSpec {
  import spark.implicits._

  private def load(dir: String, asOf: Option[Int] = None): DataFrame = {
    val r = spark.read.format("graft.sources.SnapshotSource")
    asOf.fold(r)(v => r.option("versionAsOf", v.toString)).load(dir)
  }

  test("latest and versionAsOf reads match the API reader") {
    val dir = Files.createTempDirectory("graft-dsv2snap").toString
    val rows = (0L until 200L).map(i => (i, s"s${i % 5}", i * 3))
      .toDF("id", "src", "n")
    SnapshotTable.commit(spark, rows.where($"id" < 100).repartition(3), dir)
    SnapshotTable.commit(spark, rows.where($"id" >= 100).repartition(3), dir)
    SnapshotTable.versions(dir).foreach { v =>
      val got = load(dir, Some(v)).as[(Long, String, Long)].collect().toSet
      val want = SnapshotTable.readSnapshot(spark, dir, Some(v))
        .as[(Long, String, Long)].collect().toSet
      assert(got == want, s"v$v mismatch")
    }
    // no option: latest
    assert(load(dir).count() == 200)
    // unknown version fails loudly
    intercept[Exception](load(dir, Some(99)).collect())
  }

  test("evolved columns null-fill on files that predate them") {
    val dir = Files.createTempDirectory("graft-dsv2evo").toString
    SnapshotTable.commit(spark,
      (0L until 50L).toDF("id"), dir)
    SnapshotTable.commit(spark,
      (50L until 80L).map(i => (i, s"tag$i")).toDF("id", "tag"), dir)
    val df = load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "tag"))
    assert(df.where($"tag".isNull).count() == 50)
    assert(df.where($"tag".isNotNull).count() == 30)
  }

  test("stats-column range filters prune FILES at planning time and " +
    "answers stay exact") {
    val dir = Files.createTempDirectory("graft-dsv2prune").toString
    val rows = (0L until 400L).map(i => (i, i % 7)).toDF("id", "g")
    SnapshotTable.commitWithStats(spark,
      rows.repartitionByRange(8, $"id"), dir, statsCol = Some("id"))
    val full = load(dir)
    assert(full.rdd.getNumPartitions == 8)
    val filtered = full.where($"id".between(100L, 149L))
    // range-partitioned by id: a 50-wide band overlaps ~1-2 of 8 files
    assert(filtered.rdd.getNumPartitions < 4,
      s"no file pruning: ${filtered.rdd.getNumPartitions} partitions")
    assert(filtered.select(sum("id")).as[Long].head() ==
      (100L to 149L).sum)
    // pruning is may-contain; the residual row filter must still apply
    assert(filtered.count() == 50)
    // the pruned set reaches explain as PushedFilters
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("graft_snapshot"), plan)
  }

  test("bare projection (count(*)) and single-column pruning read " +
    "without touching dropped columns") {
    val dir = Files.createTempDirectory("graft-dsv2cnt").toString
    SnapshotTable.commit(spark,
      (0L until 123L).map(i => (i, s"v$i", i.toDouble / 2, i % 2 == 0))
        .toDF("id", "s", "d", "b").repartition(2), dir)
    assert(load(dir).count() == 123)
    assert(load(dir).select("s").as[String].collect().length == 123)
    assert(load(dir).select("d", "b").where($"b")
      .as[(Double, Boolean)].collect().forall(_._2))
  }

  test("footerSchema maps flat primitives for legacy manifests") {
    val dir = Files.createTempDirectory("graft-dsv2foot").toString
    Seq((1L, "a", 0.5, 3, true)).toDF("l", "s", "d", "i", "b")
      .coalesce(1).write.parquet(s"$dir/t")
    val file = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val st = SnapshotSource.footerSchema(file)
    assert(st.fields.map(f => f.name -> f.dataType).toMap == Map(
      "l" -> LongType, "s" -> StringType, "d" -> DoubleType,
      "i" -> IntegerType, "b" -> BooleanType))
  }
}
