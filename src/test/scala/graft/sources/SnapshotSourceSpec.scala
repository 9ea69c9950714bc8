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

  test("aggregate pushdown: unfiltered count/min/max answer from " +
    "manifest bytes as a LocalTableScan; filters, grouping, and " +
    "pre-upgrade logs fall back to the file scan") {
    val dir = Files.createTempDirectory("graft-dsv2agg").toString
    val rows = (0L until 200L).map(i => (i, i * 3)).toDF("id", "n")
    SnapshotTable.commitWithStats(spark,
      rows.where($"id" < 120).repartition(3), dir, statsCol = Some("id"))
    SnapshotTable.commitWithStats(spark,
      rows.where($"id" >= 120).repartition(2), dir, statsCol = Some("id"))
    def isLocal(df: DataFrame): Boolean =
      df.queryExecution.executedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    load(dir).createOrReplaceTempView("agg_t")
    val pushed = spark.sql(
      "SELECT count(*) AS n, min(id) AS mn, max(id) AS mx FROM agg_t")
    assert(isLocal(pushed), pushed.queryExecution.executedPlan.toString)
    assert(pushed.as[(Long, Long, Long)].head() == ((200L, 0L, 199L)))
    // count alone pushes even without consulting stats
    val justCount = spark.sql("SELECT count(*) AS n FROM agg_t")
    assert(isLocal(justCount) && justCount.as[Long].head() == 200L)
    // a filter keeps the row path and stays exact
    val filtered = spark.sql(
      "SELECT count(*) AS n FROM agg_t WHERE id % 2 = 0")
    assert(!isLocal(filtered) && filtered.as[Long].head() == 100L)
    // grouping declines
    val grouped = spark.sql(
      "SELECT id % 2 AS g, count(*) FROM agg_t GROUP BY 1")
    assert(!isLocal(grouped) && grouped.count() == 2)
    // min/max on a NON-stats column declines (no metadata to answer from)
    val otherCol = spark.sql("SELECT min(n) AS mn FROM agg_t")
    assert(!isLocal(otherCol) && otherCol.as[Long].head() == 0L)
    // versionAsOf still answers from ITS manifest
    val v1 = spark.read.format("graft.sources.SnapshotSource")
      .option("versionAsOf", 1).load(dir)
    v1.createOrReplaceTempView("agg_v1")
    val pushedV1 = spark.sql("SELECT count(*) AS n, max(id) AS mx FROM agg_v1")
    assert(isLocal(pushedV1) &&
      pushedV1.as[(Long, Long)].head() == ((120L, 119L)))
    // a pre-upgrade manifest (no recorded rows) declines, never guesses
    // strip the field wherever it lives — the manifest list AND the
    // segment files a segmented append moved the per-file arrays into
    (new java.io.File(dir, "_log").listFiles().toSeq :+
        new java.io.File(dir, "_log/v00002.json")).distinct
      .filter(f => f.getName == "v00002.json" ||
        f.getName.startsWith("seg-"))
      .foreach { f =>
        val j = new String(Files.readAllBytes(f.toPath))
        Files.write(f.toPath,
          j.replaceAll(""","rows":\[[^\]]*\]""", "").getBytes)
      }
    load(dir).createOrReplaceTempView("agg_legacy")
    val legacy = spark.sql("SELECT count(*) AS n FROM agg_legacy")
    assert(!isLocal(legacy) && legacy.as[Long].head() == 200L)
  }

  test("manifest statistics reach the optimizer: exact row counts, " +
    "small byte estimates, and a snapshot dimension that BROADCASTS") {
    val dir = Files.createTempDirectory("graft-dsv2stats").toString
    SnapshotTable.commit(spark,
      (0L until 100L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val dim = load(dir)
    val stats = dim.queryExecution.optimizedPlan.stats
    // exact rows from the manifest; bytes from file sizes — far under
    // the broadcast threshold (without reported stats a DSv2 relation
    // defaults to "unknown = huge" and never broadcasts)
    assert(stats.rowCount.contains(BigInt(100)) ||
      stats.sizeInBytes < 10L * 1024 * 1024,
      s"stats not reported: $stats")
    assert(stats.sizeInBytes < 10L * 1024 * 1024, s"too big: $stats")
    val fact = spark.range(0, 10000L).select($"id", ($"id" % 100).as("k"))
    val joined = fact.join(dim, fact("k") === dim("id"))
    // the PRE-AQE physical plan already picks broadcast-hash from the
    // reported statistics — the static join decision, not a runtime fix
    val pre = joined.queryExecution.sparkPlan
    assert(pre.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, pre.toString)
    assert(joined.count() == 10000L)
  }

  test("_file metadata column: selectable by name, constant per data " +
    "file, every value a manifest file") {
    val dir = Files.createTempDirectory("graft-dsv2file").toString
    SnapshotTable.commit(spark,
      (0L until 40L).toDF("id").repartition(3), dir)
    val got = load(dir).select(col("_file"), col("id"))
      .as[(String, Long)].collect()
    assert(got.length == 40)
    assert(got.map(_._2).toSet == (0L until 40L).toSet)
    val files = got.map(_._1).toSet
    val manifest = SnapshotTable.manifestFiles(dir, 1)
      .map(f => s"$dir/$f").toSet
    assert(files.subsetOf(manifest) && files.size > 1)
    // per-file constancy: every id maps to exactly one file, and ids
    // sharing a file agree with a groupBy through the column
    val perFile = load(dir).groupBy(col("_file")).count()
      .as[(String, Long)].collect().toMap
    assert(perFile.values.sum == 40L)
  }

  test("timestampAsOf reader option resolves at-or-before and is " +
    "mutually exclusive with versionAsOf") {
    val dir = Files.createTempDirectory("graft-dsv2ts").toString
    locally {
      var tick = 0L
      SnapshotTable.clock.withValue(() => { tick += 1; tick * 1000L }) {
        SnapshotTable.commit(spark, (0L until 3L).toDF("id"), dir)
        SnapshotTable.commit(spark, (3L until 5L).toDF("id"), dir): Unit
      }
    }
    def at(ms: Long): Long = spark.read
      .format("graft.sources.SnapshotSource")
      .option("timestampAsOf", ms).load(dir).count()
    assert(at(1500L) == 3) // between commits → v1
    assert(at(2000L) == 5) // boundary inclusive → v2
    val both = intercept[Exception](spark.read
      .format("graft.sources.SnapshotSource")
      .option("timestampAsOf", 2000L).option("versionAsOf", 1)
      .load(dir).collect())
    assert(both.getMessage.contains("mutually exclusive"))
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
    // IN-list prunes by the values' [min, max] envelope: a tight batch
    // of point lookups touches ~1-2 range-clustered files, not 8
    val inList = full.where($"id".isin(110L, 120L, 130L))
    assert(inList.rdd.getNumPartitions < 4,
      s"no IN pruning: ${inList.rdd.getNumPartitions} partitions")
    assert(inList.as[(Long, Long)].collect().map(_._1).sorted.toSeq ==
      Seq(110L, 120L, 130L))
  }

  test("MULTI-column stats: DSv2 predicates on every tracked column " +
    "prune files, compound across columns, and write-path statsCol " +
    "accepts a comma list") {
    val dir = Files.createTempDirectory("graft-dsv2mprune").toString
    // b = id * 10 so range-clustering on id clusters b too
    val rows = (0L until 400L).map(i => (i, i * 10, i % 7))
      .toDF("id", "b", "g")
    SnapshotTable.commitMultiStats(spark,
      rows.repartitionByRange(8, $"id"), dir, statsCols = Seq("id", "b"))
    val full = load(dir)
    assert(full.rdd.getNumPartitions == 8)
    // a predicate on the SECOND column alone prunes
    val onB = full.where($"b".between(1000L, 1490L))
    assert(onB.rdd.getNumPartitions < 4,
      s"no b pruning: ${onB.rdd.getNumPartitions} partitions")
    assert(onB.count() == 50)
    // predicates on both columns compound to the intersection
    val both = full.where($"id" >= 100L && $"b" <= 1490L)
    assert(both.rdd.getNumPartitions < 4,
      s"no compound pruning: ${both.rdd.getNumPartitions} partitions")
    assert(both.select(sum("id")).as[Long].head() == (100L to 149L).sum)
    // min/max aggregate pushdown answers from EITHER column's stats
    full.createOrReplaceTempView("mstats_t")
    val agg = spark.sql("SELECT min(b) AS mn, max(b) AS mx FROM mstats_t")
    assert(agg.queryExecution.executedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec]),
      agg.queryExecution.executedPlan.toString)
    assert(agg.as[(Long, Long)].head() == ((0L, 3990L)))
    // DSv2 write path: .option("statsCol", "a,b") tracks both
    val dir2 = Files.createTempDirectory("graft-dsv2mw").toString
    rows.repartitionByRange(4, $"id").write
      .format("graft.sources.SnapshotSource")
      .option("statsCol", "id,b").mode("append").save(dir2)
    assert(SnapshotTable.statsColumns(dir2, 1) == Seq("id", "b"))
    val w = load(dir2).where($"b" < 500L)
    assert(w.rdd.getNumPartitions < 3 && w.count() == 50)
  }

  test("PARTITIONED tables through DSv2: equality/IN/IS NULL prune " +
    "partitions exactly at planning, answers stay value-exact, SQL " +
    "DML refuses toward the partition-aware API tier") {
    val dir = Files.createTempDirectory("graft-dsv2part").toString
    val rows = (0L until 300L).map(i =>
      (i, if (i % 5 == 4) null else s"g${i % 4}", i * 3))
      .toDF("id", "grp", "n")
    SnapshotTable.commitPartitioned(spark, rows, dir, Seq("grp"))
    val full = load(dir)
    val allParts = full.rdd.getNumPartitions
    assert(allParts >= 5) // 4 values + the NULL partition
    // equality prunes to one partition's files
    val one = full.where($"grp" === "g1")
    assert(one.rdd.getNumPartitions < allParts / 2,
      s"no partition pruning: ${one.rdd.getNumPartitions} of $allParts")
    assert(one.select(sum("id")).as[Long].head() ==
      (0L until 300L).filter(i => i % 4 == 1 && i % 5 != 4).sum)
    // IN keeps exactly the named partitions
    val two = full.where($"grp".isin("g0", "g3"))
    assert(two.rdd.getNumPartitions < allParts)
    assert(two.count() ==
      (0L until 300L).count(i => (i % 4 == 0 || i % 4 == 3) && i % 5 != 4))
    // IS NULL selects the NULL partition
    val nul = full.where($"grp".isNull)
    assert(nul.rdd.getNumPartitions < allParts / 2)
    assert(nul.count() == (0L until 300L).count(_ % 5 == 4))
    // IN with a NULL element: SQL `IN (..., NULL)` never matches NULL
    // rows — the prune drops the null literal (NULL partition's files
    // excluded, same footprint as the null-free list), answers exact
    val inNull = full.where($"grp".isin("g1", null))
    assert(inNull.rdd.getNumPartitions == one.rdd.getNumPartitions,
      s"IN(..., NULL) kept extra partitions: " +
        s"${inNull.rdd.getNumPartitions} vs ${one.rdd.getNumPartitions}")
    assert(inNull.count() == one.count())
    // contradictory equalities prune everything, schema intact
    val none = full.where($"grp" === "g1" && $"grp" === "g2")
    assert(none.count() == 0L)
    // SQL UPDATE refuses toward the API tier on a partitioned table
    spark.conf.set("spark.sql.catalog.gpart_cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gpart_cat.root",
      new java.io.File(dir).getParent)
    val name = new java.io.File(dir).getName
    val err = intercept[Exception](
      spark.sql(s"UPDATE gpart_cat.`$name` SET n = 0 WHERE id = 1"))
    assert(err.getMessage.contains("PARTITIONED"), err.getMessage)
  }

  test("NULL-COUNT stats: IS NULL / IS NOT NULL prune files from " +
    "manifest null counts, answers stay exact, counts carry through " +
    "append and DML, pre-tier manifests decline") {
    val dir = Files.createTempDirectory("graft-dsv2null").toString
    // nulls file-localized: range-cluster on the residue that decides
    // nullability (opt null iff id % 10 >= 5)
    val rows = (0L until 400L).map(i =>
      (i, i % 10, if (i % 10 < 5) Some(i * 3) else None))
      .toDF("id", "r10", "opt")
    SnapshotTable.commitMultiStats(spark,
      rows.repartitionByRange(4, $"r10"), dir,
      statsCols = Seq("id", "opt"))
    assert(SnapshotTable.readNullCounts(dir, 1).contains("opt"))
    val full = load(dir)
    val allParts = full.rdd.getNumPartitions
    val nn = full.where($"opt".isNotNull)
    val nl = full.where($"opt".isNull)
    assert(nn.rdd.getNumPartitions < allParts,
      s"IS NOT NULL did not prune: ${nn.rdd.getNumPartitions}/$allParts")
    assert(nl.rdd.getNumPartitions < allParts,
      s"IS NULL did not prune: ${nl.rdd.getNumPartitions}/$allParts")
    assert(nn.count() == 200L && nl.count() == 200L)
    assert(nn.select(sum($"opt")).as[Long].head() ==
      (0L until 400L).filter(_ % 10 < 5).map(_ * 3).sum)
    // counts CARRY: append keeps the tier, CoW delete re-derives for
    // rewritten files and carries the rest
    SnapshotTable.commitMultiStats(spark,
      (400L until 440L).map(i => (i, i % 10,
        if (i % 10 < 5) Some(i * 3) else None)).toDF("id", "r10", "opt")
        .repartitionByRange(2, $"r10"),
      dir, statsCols = Seq("id", "opt"))
    assert(SnapshotTable.readNullCounts(dir, 2)("opt").sum == 220L)
    SnapshotTable.delete(spark, dir, $"id" === 7L) // a null-opt row
    assert(SnapshotTable.readNullCounts(dir, 3)("opt").sum == 219L)
    assert(load(dir).where($"opt".isNull).count() == 219L)
    // the DSv2 WRITE surface records null counts too (writer-side
    // fold — NULLs in a stats column are legal now; an all-null file
    // records the always-prune min/max sentinel)
    val dirW = Files.createTempDirectory("graft-dsv2null3").toString
    rows.repartitionByRange(4, $"r10").write
      .format("graft.sources.SnapshotSource")
      .option("statsCol", "id,opt").mode("append").save(dirW)
    assert(SnapshotTable.readNullCounts(dirW, 1)("opt").sum == 200L)
    val wf = load(dirW)
    assert(wf.where($"opt".isNull).rdd.getNumPartitions <
      wf.rdd.getNumPartitions)
    assert(wf.where($"opt".isNull).count() == 200L)
    assert(wf.where($"opt".isNotNull).count() == 200L)
    // pre-tier manifests (no ncols) decline: prune keeps everything
    val legacy = Files.createTempDirectory("graft-dsv2null2").toString
    SnapshotTable.commit(spark, rows, legacy)
    assert(SnapshotTable.readNullCounts(legacy, 1).isEmpty)
    assert(SnapshotTable.manifestFilesPruned(legacy, 1, Map.empty,
      Map.empty, Map("opt" -> true)).length ==
      SnapshotTable.manifestFiles(legacy, 1).length)
  }

  test("STORAGE-PARTITIONED JOIN: two snapshot tables partitioned on " +
    "the same key join AND aggregate on it with ZERO exchanges; the " +
    "report declines on unpartitioned scans and missing projections") {
    val dirA = Files.createTempDirectory("graft-spjA").toString
    val dirB = Files.createTempDirectory("graft-spjB").toString
    val rows = (0L until 400L).map(i => (i, s"g${i % 5}", i * 2))
      .toDF("id", "grp", "n")
    val dim = (0 until 5).map(k => (s"g$k", k * 100L)).toDF("grp", "bonus")
    SnapshotTable.commitPartitioned(spark, rows, dirA, Seq("grp"))
    SnapshotTable.commitPartitioned(spark, dim, dirB, Seq("grp"))
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val before = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = load(dirA).join(load(dirB), "grp")
        .groupBy("grp")
        .agg(count(lit(1)).as("n_rows"),
          sum($"n" + $"bonus").as("s"))
      val got = joined.as[(String, Long, Long)].collect().toSet
      val want = (0 until 5).map { k =>
        val ids = (0L until 400L).filter(_ % 5 == k)
        (s"g$k", ids.size.toLong, ids.map(_ * 2 + k * 100L).sum)
      }.toSet
      assert(got == want)
      // the whole executed plan — join AND aggregate — has no
      // exchange of any kind (inspect AFTER execution: AQE finalizes)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected zero exchanges:\n$plan")
      // an unpartitioned table reports no key grouping (decline path)
      val dirC = Files.createTempDirectory("graft-spjC").toString
      SnapshotTable.commit(spark, dim, dirC)
      val mixed = load(dirA).join(load(dirC), "grp").groupBy("grp")
        .agg(count(lit(1)).as("n_rows"))
      assert(mixed.as[(String, Long)].collect().toMap
        .forall { case (g, n) => n == 80L && g.startsWith("g") })
      // MISMATCHED partition value sets (dim lacks g4): answers stay
      // exact whatever plan Spark picks for the asymmetric SPJ
      val dirD = Files.createTempDirectory("graft-spjD").toString
      SnapshotTable.commitPartitioned(spark,
        (0 until 4).map(k => (s"g$k", k * 100L)).toDF("grp", "bonus"),
        dirD, Seq("grp"))
      val jm = load(dirA).join(load(dirD), "grp")
        .groupBy("grp").agg(count(lit(1)).as("n_rows"))
      assert(jm.as[(String, Long)].collect().toMap ==
        (0 until 4).map(k => s"g$k" -> 80L).toMap)
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("SPJ ACROSS SPEC EVOLUTION: a table whose spec evolution left " +
    "UNKNOWN-tuple files declines the key-grouped report (sound), and " +
    "repairPartitionSpec restores the ZERO-exchange plan — exact " +
    "answers on both sides of the boundary") {
    val dirA = Files.createTempDirectory("graft-spjEvA").toString
    val dirB = Files.createTempDirectory("graft-spjEvB").toString
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, s"g${i % 5}", i * 2)).toDF("id", "grp", "n")
    val dim = (0 until 5).map(k => (s"g$k", k * 100L)).toDF("grp", "bonus")
    SnapshotTable.commit(spark, mk(0L, 200L), dirA)        // v1 flat
    SnapshotTable.commitPartitioned(spark, mk(200L, 400L), dirA,
      Seq("grp"), evolveSpec = true)                       // v2 evolved
    SnapshotTable.commitPartitioned(spark, dim, dirB, Seq("grp"))
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val before = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val want = (0 until 5).map { k =>
        val ids = (0L until 400L).filter(_ % 5 == k)
        (s"g$k", ids.size.toLong, ids.map(_ * 2 + k * 100L).sum)
      }.toSet
      def joined() = load(dirA).join(load(dirB), "grp")
        .groupBy("grp")
        .agg(count(lit(1)).as("n_rows"),
          sum($"n" + $"bonus").as("s"))
      // pre-repair: the v1 files carry the UNKNOWN marker, the scan
      // must NOT claim key-grouped partitioning — but answers stay
      // exact under whatever plan Spark picks
      assert(joined().as[(String, Long, Long)].collect().toSet == want)
      // repair rewrites ONLY the unknown-tuple files; the table is
      // value-pure again and the SPJ report returns: the whole
      // executed plan — join AND aggregate — runs with zero exchanges
      assert(SnapshotTable.repairPartitionSpec(spark, dirA).contains(3))
      val after = joined()
      assert(after.as[(String, Long, Long)].collect().toSet == want)
      val plan = after.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected zero exchanges after repair:\n$plan")
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("RENAME COLUMN through the DSv2 source: the vectorized AND row " +
    "readers remap each file's physical names, stats pruning serves " +
    "the new name, SQL ALTER TABLE RENAME COLUMN round-trips, and " +
    "time travel keeps the version's own name") {
    val dir = Files.createTempDirectory("graft-dsv2ren").toString
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, i * 10, s"s$i")).toDF("id", "n", "s")
    SnapshotTable.commitMultiStats(spark, mk(0L, 40L).repartition(2),
      dir, statsCols = Seq("n"))                              // v1
    assert(SnapshotTable.renameColumn(dir, "n", "metric") == 2)
    SnapshotTable.commitMultiStats(spark,
      (40L until 80L).map(i => (i, i * 10, s"s$i"))
        .toDF("id", "metric", "s").repartition(2), dir,
      statsCols = Seq("metric"))                              // v3
    // vectorized (default) read: old files surface under the new name
    val got = load(dir)
    assert(got.columns.toSeq == Seq("id", "metric", "s"))
    assert(got.select("id", "metric").as[(Long, Long)].collect().toSet ==
      (0L until 80L).map(i => (i, i * 10)).toSet)
    // row-path parity
    val rowPath = spark.read.format("graft.sources.SnapshotSource")
      .option("vectorizedRead", "false").load(dir)
    assert(rowPath.select("id", "metric").as[(Long, Long)]
      .collect().toSet ==
      (0L until 80L).map(i => (i, i * 10)).toSet)
    // filter on the NEW name stays exact over OLD files
    assert(got.where($"metric" === 110L).select("id")
      .as[Long].collect().toSeq == Seq(11L))
    // time travel below the rename keeps its own name
    assert(load(dir, Some(1)).columns.toSeq == Seq("id", "n", "s"))
    // SQL surface: ALTER TABLE RENAME COLUMN is the same metadata-only
    // commit; reads and aggregate pushdown follow the new name
    spark.conf.set("spark.sql.catalog.gren_cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gren_cat.root",
      new java.io.File(dir).getParent)
    val name = new java.io.File(dir).getName
    spark.sql(s"ALTER TABLE gren_cat.`$name` RENAME COLUMN metric TO m2")
    assert(SnapshotTable.readSchema(dir, 4).get.fieldNames.toSeq ==
      Seq("id", "m2", "s"))
    assert(spark.sql(s"SELECT sum(m2) AS t FROM gren_cat.`$name`")
      .as[Long].head() == (0L until 80L).map(_ * 10).sum)
    assert(spark.sql(
      s"SELECT count(*) AS c FROM gren_cat.`$name` WHERE m2 < 400")
      .as[Long].head() == 40L)
  }

  test("CHANGE FEED across a rename: batch + DSv2 feed reads surface " +
    "every version under the END names; a running stream keeps its " +
    "start-schema names over post-rename appends") {
    val dir = Files.createTempDirectory("graft-cdfren").toString
    SnapshotTable.enableChangeFeed(dir)
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, i * 10)).toDF("id", "n")
    SnapshotTable.commit(spark, mk(0L, 20L), dir)             // v1
    SnapshotTable.delete(spark, dir, $"n" === 50L)            // v2 CoW
    assert(SnapshotTable.renameColumn(dir, "n", "metric") == 3)
    SnapshotTable.commit(spark,
      (20L until 30L).map(i => (i, i * 10)).toDF("id", "metric"),
      dir)                                                    // v4
    // batch API: one frame, END names, rename version feeds nothing
    val feed = SnapshotTable.readChangeFeed(spark, dir, 1)
    assert(feed.columns.toSeq ==
      Seq("id", "metric", "_change_type", "_commit_version"))
    assert(feed.where($"_commit_version" === 3L).count() == 0L)
    assert(feed.groupBy($"_change_type").count()
      .as[(String, Long)].collect().toMap ==
      Map("insert" -> 30L, "delete" -> 1L))
    assert(feed.where($"_change_type" === "delete")
      .select("metric").as[Long].head() == 50L)
    // DSv2 feed read remaps per file (old files under end names)
    val dsv2 = spark.read.format("graft.sources.SnapshotSource")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .load(dir)
    assert(dsv2.where($"_change_type" === "insert")
      .agg(sum("metric")).as[Long].head() ==
      (0L until 30L).map(_ * 10).sum)
    // streaming source ACROSS the rename: a stream whose schema is the
    // END schema replays pre-rename appends remapped per file
    val sq = spark.readStream.format("graft.sources.SnapshotSource")
      .option("startingVersion", 1).option("ignoreRewrites", "true")
      .load(dir)
      .writeStream.format("memory").queryName("ren_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination(60000)
    assert(spark.table("ren_stream").select("id", "metric")
      .as[(Long, Long)].collect().toSet ==
      (0L until 30L).map(i => (i, i * 10)).toSet)
  }

  test("HIDDEN PARTITIONING through DSv2: source-column filters prune " +
    "the planned file set through the transform (equality AND range), " +
    "answers stay row-exact, and SQL DELETE on the source falls to " +
    "copy-on-write — never a cell drop") {
    import graft.io.PartTransform
    val dir = Files.createTempDirectory("graft-dsv2hid").toString
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-03-01 00:00:00").getTime
    val rows = (0L until 240L)
      .map(i => (i, new Timestamp(t0 + i * 30L * 60_000L), i % 90))
      .toDF("id", "ts", "n")                       // 5 days, n in 0..89
    SnapshotTable.commitPartitionedTransforms(spark, rows, dir,
      Seq(PartTransform.DateUnit("ts", "day"),
        PartTransform.Trunc("n", 30L)))
    def planned(df: DataFrame): Int = {
      val d = df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString
      """files=(\d+)""".r.findFirstMatchIn(d).map(_.group(1).toInt)
        .getOrElse(fail(s"no snapshot scan leaf in:\n$d"))
    }
    val all = planned(load(dir))
    // range on the RAW timestamp: only the matching days' cells plan
    val lo = Timestamp.valueOf("2026-03-04 06:00:00")
    val ranged = load(dir).where($"ts" >= lit(lo))
    assert(planned(ranged) < all)
    assert(ranged.count() ==
      (0L until 240L).count(i => t0 + i * 30L * 60_000L >= lo.getTime))
    // equality on the truncated source: one cell's files plan
    val eq = load(dir).where($"n" === 42L)
    assert(planned(eq) < all)
    assert(eq.select("id").as[Long].collect().toSet ==
      (0L until 240L).filter(_ % 90 == 42).toSet)
    // compound: both transforms prune together
    val both = load(dir).where($"ts" >= lit(lo) && $"n" < 30L)
    assert(planned(both) <= planned(ranged))
    assert(both.count() == (0L until 240L).count(i =>
      t0 + i * 30L * 60_000L >= lo.getTime && i % 90 < 30))
    // SQL DELETE with equality on the SOURCE column: the metadata
    // cell-drop would delete the whole day — it must fall to the
    // row-exact copy-on-write path instead
    spark.conf.set("spark.sql.catalog.ghid_cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.ghid_cat.root",
      new java.io.File(dir).getParent)
    val name = new java.io.File(dir).getName
    val victim = new Timestamp(t0 + 99L * 30L * 60_000L) // inside day 3
    spark.sql(s"DELETE FROM ghid_cat.`$name` WHERE ts = " +
      s"TIMESTAMP'${victim.toString.stripSuffix(".0")}'")
    assert(load(dir).count() == 239L) // exactly ONE row gone
    assert(load(dir).where($"id" === 99L).count() == 0L)
  }

  test("SQL DELETE on a partition column is METADATA-ONLY (no data " +
    "file touched); non-partition deletes still rewrite copy-on-write") {
    val dir = Files.createTempDirectory("graft-dsv2pdel").toString
    val rows = (0L until 200L).map(i => (i, s"g${i % 4}", i * 3))
      .toDF("id", "grp", "n")
    SnapshotTable.commitPartitioned(spark, rows, dir, Seq("grp"))
    spark.conf.set("spark.sql.catalog.gdel_cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gdel_cat.root",
      new java.io.File(dir).getParent)
    val name = new java.io.File(dir).getName
    def diskFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        Option(f.listFiles()).getOrElse(Array.empty).flatMap(k =>
          if (k.isDirectory) walk(k)
          else if (k.getName.endsWith(".parquet")) Seq(k.getPath)
          else Seq.empty).toSeq
      walk(new java.io.File(dir, "data")).toSet
    }
    val before = diskFiles()
    spark.sql(s"DELETE FROM gdel_cat.`$name` WHERE grp = 'g2'")
    // metadata-only: the filesystem is untouched, the answer exact
    assert(diskFiles() == before)
    assert(spark.sql(s"SELECT count(*) FROM gdel_cat.`$name`")
      .as[Long].head() == 150L)
    assert(SnapshotTable.manifestFiles(dir, 2).toSet
      .subsetOf(SnapshotTable.manifestFiles(dir, 1).toSet))
    // IN-list on the partition column: still metadata-only, one commit
    val afterEq = diskFiles()
    spark.sql(s"DELETE FROM gdel_cat.`$name` WHERE grp IN ('g0', 'g3')")
    assert(diskFiles() == afterEq)
    assert(spark.sql(s"SELECT count(*) FROM gdel_cat.`$name`")
      .as[Long].head() == 50L) // only g1 remains
    assert(SnapshotTable.resolveVersion(dir) == 3)
    // a non-partition predicate rewrites (new files appear), partition
    // metadata stays truthful afterwards
    spark.sql(s"DELETE FROM gdel_cat.`$name` WHERE id < 10")
    assert(diskFiles() != before)
    assert(spark.sql(s"SELECT count(*) FROM gdel_cat.`$name`")
      .as[Long].head() ==
      (0L until 200L).count(i => i % 4 == 1 && i >= 10))
    val v3 = SnapshotTable.resolveVersion(dir)
    assert(SnapshotTable.partitionColumns(dir, v3) == Seq("grp"))
    assert(SnapshotTable.readPartValues(dir, v3).get.length ==
      SnapshotTable.manifestFiles(dir, v3).length)
    // a partition delete that would EMPTY the table must not surface
    // the metadata path's refusal — it falls back to copy-on-write
    // (zero-row anchor), and the table reads empty afterwards
    spark.sql(s"DELETE FROM gdel_cat.`$name` WHERE grp = 'g1'")
    assert(spark.sql(s"SELECT count(*) FROM gdel_cat.`$name`")
      .as[Long].head() == 0L)
    assert(SnapshotTable.partitionColumns(dir,
      SnapshotTable.resolveVersion(dir)) == Seq("grp"))
  }

  test("PARTITIONED writes through plain df.write and writeStream: " +
    "writers route rows into value-pure files, values land in the " +
    "manifest, appends inherit the layout, mismatches refuse") {
    val dir = Files.createTempDirectory("graft-dsv2pwrite").toString
    val rows = (0L until 200L).map(i => (i, s"g${i % 3}", i * 2))
      .toDF("id", "grp", "n")
    // first commit declares the partitioning via the write option
    rows.write.format("graft.sources.SnapshotSource")
      .option("partitionBy", "grp").option("statsCol", "id")
      .mode("append").save(dir)
    assert(SnapshotTable.partitionColumns(dir, 1) == Seq("grp"))
    val files1 = SnapshotTable.manifestFiles(dir, 1)
    val pvals1 = SnapshotTable.readPartValues(dir, 1).get
    assert(pvals1.length == files1.length)
    assert(pvals1.flatten.flatten.toSet == Set("g0", "g1", "g2"))
    // value purity straight from the writer's routing
    files1.zip(pvals1).foreach { case (f, Seq(v)) =>
      val got = spark.read.parquet(s"$dir/$f").select("grp")
        .distinct().as[String].collect().toSeq
      assert(got == Seq(v.get), s"$f not value-pure")
    }
    // an append with NO option inherits the table's partitioning
    (200L until 230L).map(i => (i, s"g${i % 3}", i * 2))
      .toDF("id", "grp", "n")
      .write.format("graft.sources.SnapshotSource")
      .option("statsCol", "id").mode("append").save(dir)
    assert(SnapshotTable.partitionColumns(dir, 2) == Seq("grp"))
    assert(SnapshotTable.readPartValues(dir, 2).get.length ==
      SnapshotTable.manifestFiles(dir, 2).length)
    // the written values immediately serve partition pruning + the
    // metadata DELETE fast path
    val full = load(dir)
    val one = full.where($"grp" === "g1")
    assert(one.rdd.getNumPartitions < full.rdd.getNumPartitions)
    assert(one.count() == (0L until 230L).count(_ % 3 == 1))
    SnapshotTable.deletePartitions(dir, Map("grp" -> "g0"))
    assert(load(dir).count() == (0L until 230L).count(_ % 3 != 0))
    // a mismatched explicit option refuses
    val err = intercept[Exception] {
      rows.write.format("graft.sources.SnapshotSource")
        .option("partitionBy", "id").option("statsCol", "id")
        .mode("append").save(dir)
    }
    assert(err.getMessage.contains("partitioned by"), err.getMessage)
    // STREAMING sink into a fresh partitioned table: per-epoch appends
    // carry values; content and layout exact
    val dir2 = Files.createTempDirectory("graft-dsv2pstrm").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String, Long)]
    src.addData((0L until 40L).map(i => (i, s"g${i % 2}", i)): _*)
    val q = src.toDF().toDF("id", "grp", "n")
      .writeStream.format("graft.sources.SnapshotSource")
      .option("partitionBy", "grp")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-pw-ck").toString)
      .start(dir2)
    try {
      src.addData((40L until 70L).map(i => (i, s"g${i % 2}", i)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(SnapshotTable.partitionColumns(dir2,
      SnapshotTable.versions(dir2).last) == Seq("grp"))
    assert(load(dir2).where($"grp" === "g1").count() ==
      (0L until 70L).count(_ % 2 == 1))
    assert(SnapshotTable.readPartValues(dir2,
      SnapshotTable.versions(dir2).last).get.flatten.flatten.toSet ==
      Set("g0", "g1"))
  }

  test("STREAMING source tails PARTITIONED appends: value-pure files " +
    "feed incrementally with the partition column as data") {
    val dir = Files.createTempDirectory("graft-dsv2pstream").toString
    def batch(lo: Long, hi: Long) = (lo until hi).map(i =>
      (i, s"g${i % 2}", i * 2)).toDF("id", "grp", "n")
    SnapshotTable.commitPartitioned(spark, batch(0, 50), dir, Seq("grp"))
    SnapshotTable.commitPartitioned(spark, batch(50, 80), dir, Seq("grp"))
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .option("startingVersion", 0).load(dir)
      .writeStream.format("memory").queryName("pstream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT id, grp, n FROM pstream")
      .as[(Long, String, Long)].collect().toSet
    assert(got == batch(0, 80).as[(Long, String, Long)].collect().toSet)
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

  private def save(df: DataFrame, dir: String, mode: String,
                   statsCol: Option[String] = None): Unit = {
    val w = df.write.format("graft.sources.SnapshotSource").mode(mode)
    statsCol.fold(w)(c => w.option("statsCol", c)).save(dir)
  }

  test("DSv2 write: append/append/overwrite commit through the log, " +
    "API and DSv2 reads agree, every version time-travels") {
    val dir = Files.createTempDirectory("graft-dsv2w").toString
    val rows = (0L until 300L).map(i => (i, s"s${i % 5}", i * 2))
      .toDF("id", "src", "n")
    save(rows.where($"id" < 100).repartition(3), dir, "append")
    save(rows.where($"id" >= 100 && $"id" < 200).repartition(3), dir,
      "append")
    assert(SnapshotTable.versions(dir) == Seq(1, 2))
    assert(load(dir, Some(1)).count() == 100)
    assert(load(dir).count() == 200)
    // DSv2 read == API read, per version
    SnapshotTable.versions(dir).foreach { v =>
      assert(load(dir, Some(v)).as[(Long, String, Long)].collect().toSet ==
        SnapshotTable.readSnapshot(spark, dir, Some(v))
          .as[(Long, String, Long)].collect().toSet, s"v$v")
    }
    // overwrite truncates: v3 holds only its own rows
    save(rows.where($"id" >= 200).repartition(2), dir, "overwrite")
    assert(load(dir).as[(Long, String, Long)].collect()
      .forall(_._1 >= 200L))
    assert(load(dir, Some(2)).count() == 200) // history intact
  }

  test("DSv2 write: schema evolution (append adds a column, old files " +
    "null-fill) and writer-folded stats prune the read") {
    val dir = Files.createTempDirectory("graft-dsv2we").toString
    save((0L until 200L).map(i => (i, i * 3)).toDF("id", "n")
      .repartitionByRange(4, $"id"), dir, "append", Some("id"))
    save((200L until 260L).map(i => (i, i * 3, s"t$i")).toDF("id", "n", "tag")
      .repartitionByRange(2, $"id"), dir, "append", Some("id"))
    val df = load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "n", "tag"))
    assert(df.where($"tag".isNull).count() == 200)
    assert(df.where($"tag".isNotNull).count() == 60)
    // stats folded by the WRITERS (no post-hoc job) prune files at
    // planning time: 6 range-disjoint files, a 40-wide band hits 1-2
    val filtered = df.where($"id".between(60L, 99L))
    assert(filtered.rdd.getNumPartitions < 3,
      s"no pruning: ${filtered.rdd.getNumPartitions}")
    assert(filtered.count() == 40)
    assert(filtered.select(sum("id")).as[Long].head() == (60L to 99L).sum)
    // type change is refused loudly
    intercept[Exception](save(Seq(("x", 1L)).toDF("id", "n"), dir, "append"))
  }

  test("DSv2 write: an all-empty write commits a readable empty version") {
    val dir = Files.createTempDirectory("graft-dsv2wz").toString
    save((0L until 10L).toDF("id"), dir, "append")
    save((0L until 10L).toDF("id").where($"id" < 0), dir, "overwrite")
    assert(SnapshotTable.versions(dir) == Seq(1, 2))
    assert(load(dir).count() == 0)
    assert(load(dir).schema.fieldNames.toSeq == Seq("id"))
    assert(load(dir, Some(1)).count() == 10)
  }

  test("STREAMING sink: one version per non-empty epoch, content exact, " +
    "replayed epochs commit exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-dsv2ws").toString
    val ckpt = Files.createTempDirectory("graft-dsv2wsck").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "s")
      .writeStream.outputMode("append")
      .format("graft.sources.SnapshotSource")
      .option("checkpointLocation", ckpt)
      .start(dir)
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    // one append commit per non-empty epoch, content exact
    assert(SnapshotTable.versions(dir).size == 2)
    assert(load(dir).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(load(dir, Some(1)).count() == 2)
    // the (queryId, epoch) txns landed in the log, and a REPLAYED epoch
    // is a no-op: drive the StreamingWrite directly with an
    // already-committed (queryId, epoch) pair
    val txns = SnapshotTable.committedTxns(dir)
    assert(txns.size == 2)
    val qid = txns.head._1
    assert(txns.forall(_._1 == qid), "one query wrote both epochs")
    val epochs = SnapshotTable.committedEpochs(dir, qid)
    assert(epochs.size == 2)
    val sw = new SnapshotStreamingWrite(dir,
      load(dir).schema, statsCols = Nil, queryId = qid)
    sw.commit(epochs.head,
      Array(SnapshotCommitMsg(Seq(SnapshotFileMsg(
        "data/ghost.parquet", Seq.empty, Seq.empty, 1L)))))
    assert(SnapshotTable.versions(dir).size == 2, "replay double-committed")
    // a DIFFERENT query's epoch 0 must NOT collide with this one's:
    // dedup keys on the (queryId, epoch) PAIR, or a second stream with a
    // fresh checkpoint writing to the same table silently loses batches
    val other = new SnapshotStreamingWrite(dir,
      load(dir).schema, statsCols = Nil, queryId = "otherquery")
    val rel = "data/sother/part-0.parquet"
    new ParquetGroupWriter(s"$dir/$rel", load(dir).schema,
      Array.empty).close()
    other.commit(epochs.head,
      Array(SnapshotCommitMsg(Seq(SnapshotFileMsg(
        rel, Seq.empty, Seq.empty, 0L)))))
    assert(SnapshotTable.versions(dir).size == 3,
      "a second query's first epoch was silently dropped")
  }

  test("STREAMING source: startingVersion=0 replays history, appends " +
    "feed incrementally, carried-forward files never re-read, " +
    "rewrites refuse naming the escape") {
    val dir = Files.createTempDirectory("graft-dsv2rs").toString
    SnapshotTable.commit(spark, (0L until 40L).toDF("id"), dir)
    SnapshotTable.commit(spark, (40L until 70L).toDF("id"), dir)
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .option("startingVersion", 0)
      .load(dir)
      .writeStream.format("memory").queryName("snap_rs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_rs").count() == 70)
      // a commit landing while the stream runs arrives incrementally:
      // only v3's ADDED files feed (70 rows stay, 5 arrive once)
      SnapshotTable.commit(spark, (70L until 75L).toDF("id"), dir)
      q.processAllAvailable()
      assert(spark.table("snap_rs").as[Long].collect().sorted.toSeq ==
        (0L until 75L))
      // a rewrite (CoW delete) breaks the append-only contract loudly,
      // and the error names the way out
      SnapshotTable.delete(spark, dir, $"id" < 10)
      val ex = intercept[Exception] { q.processAllAvailable() }
      def causes(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ causes(t.getCause)
      assert(causes(ex).exists(_.contains("ignoreRewrites")),
        s"refusal must name the escape hatch: ${causes(ex)}")
    } finally q.stop()
  }

  test("STREAMING source: the DEFAULT start offset tails from the " +
    "latest version — history is not replayed by accident") {
    val dir = Files.createTempDirectory("graft-dsv2tail").toString
    SnapshotTable.commit(spark, (0L until 40L).toDF("id"), dir)
    SnapshotTable.commit(spark, (40L until 70L).toDF("id"), dir)
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .load(dir)
      .writeStream.format("memory").queryName("snap_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_tail").count() == 0,
        "tail-from-now replayed history")
      SnapshotTable.commit(spark, (70L until 75L).toDF("id"), dir)
      q.processAllAvailable()
      assert(spark.table("snap_tail").as[Long].collect().sorted.toSeq ==
        (70L until 75L))
    } finally q.stop()
  }

  test("STREAMING source: startingTimestamp replays from the earliest " +
    "commit at-or-after t; beyond-latest and mixed options refuse") {
    val dir = Files.createTempDirectory("graft-dsv2st").toString
    locally {
      var tick = 0L
      SnapshotTable.clock.withValue(() => { tick += 1; tick * 1000L }) {
        SnapshotTable.commit(spark, (0L until 5L).toDF("id"), dir)   // @1000
        SnapshotTable.commit(spark, (5L until 9L).toDF("id"), dir)   // @2000
        SnapshotTable.commit(spark, (9L until 12L).toDF("id"), dir): Unit // @3000
      }
    }
    // t = 1500 → earliest commit at-or-after = v2: replay v2 + v3
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .option("startingTimestamp", 1500L)
      .load(dir)
      .writeStream.format("memory").queryName("snap_st")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_st").as[Long].collect().sorted.toSeq ==
        (5L until 12L))
    } finally q.stop()
    // a timestamp past the latest commit refuses loudly — tailing
    // silently would skip exactly what the caller asked to replay
    val late = intercept[Exception](
      spark.readStream.format("graft.sources.SnapshotSource")
        .option("startingTimestamp", 999999L).load(dir)
        .writeStream.format("memory").queryName("snap_st_late")
        .outputMode("append").start().processAllAvailable())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(late).exists(_.contains("nothing to replay")), late)
    // mutually exclusive with startingVersion
    val both = intercept[Exception](
      spark.readStream.format("graft.sources.SnapshotSource")
        .option("startingTimestamp", 1500L)
        .option("startingVersion", 1).load(dir)
        .writeStream.format("memory").queryName("snap_st_both")
        .outputMode("append").start().processAllAvailable())
    assert(msgs(both).exists(_.contains("mutually exclusive")), both)
  }

  test("STREAMING source: startingVersion=v feeds from v INCLUSIVE " +
    "(the Delta convention), ignoreRewrites skips a rewrite and keeps " +
    "feeding, and an overwrite FIRST commit feeds as the initial " +
    "append") {
    val dir = Files.createTempDirectory("graft-dsv2sv").toString
    // v1 is an OVERWRITE (a first commit in overwrite mode = initial
    // append — streamable, the q-ADVICE case)
    SnapshotTable.commit(spark, (0L until 10L).toDF("id"), dir,
      overwrite = true)
    SnapshotTable.commit(spark, (10L until 30L).toDF("id"), dir)
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .option("startingVersion", 2) // inclusive: feed v2 onward
      .option("ignoreRewrites", true)
      .load(dir)
      .writeStream.format("memory").queryName("snap_sv")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_sv").as[Long].collect().sorted.toSeq ==
        (10L until 30L))
      // a mid-stream rewrite is SKIPPED under ignoreRewrites (its
      // rewritten rows are not re-fed) and the next append still feeds,
      // diffed against the rewrite's manifest
      SnapshotTable.delete(spark, dir, $"id" < 5)
      SnapshotTable.commit(spark, (30L until 35L).toDF("id"), dir)
      q.processAllAvailable()
      assert(spark.table("snap_sv").as[Long].collect().sorted.toSeq ==
        ((10L until 30L) ++ (30L until 35L)))
    } finally q.stop()
    // replay-from-genesis over the overwrite-first log: v1 feeds
    val q2 = spark.readStream.format("graft.sources.SnapshotSource")
      .option("startingVersion", 0)
      .option("ignoreRewrites", true)
      .load(dir)
      .writeStream.format("memory").queryName("snap_sv0")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      // v1 (overwrite-as-initial-append) + v2 + v4's appended files;
      // v3's rewrite is skipped, so the deleted ids 0-4 still appear
      // from v1's original files — the documented ignoreRewrites trade
      assert(spark.table("snap_sv0").as[Long].collect().sorted.toSeq ==
        (0L until 35L))
    } finally q2.stop()
  }

  test("row-group-split reads: an oversized file fans out to range " +
    "partitions, every row read exactly once, count(*) split-correct") {
    val dir = Files.createTempDirectory("graft-dsv2split").toString
    // many small row groups: parquet.block.size=4KB over ~200KB of rows
    val rows = (0L until 20000L).map(i => (i, s"s$i%09d" * 3)).toDF("id", "s")
    spark.conf.set("spark.hadoop.parquet.block.size", "4096")
    try SnapshotTable.commit(spark, rows.coalesce(1), dir)
    finally spark.conf.unset("spark.hadoop.parquet.block.size")
    def loadSplit(maxSplit: Long) =
      spark.read.format("graft.sources.SnapshotSource")
        .option("maxSplitBytes", maxSplit.toString).load(dir)
    val whole = loadSplit(Long.MaxValue)
    assert(whole.rdd.getNumPartitions == 1)
    val split = loadSplit(16 * 1024)
    assert(split.rdd.getNumPartitions > 4,
      s"no fan-out: ${split.rdd.getNumPartitions} partitions")
    // exactly-once across the split grid: content and count identical
    assert(split.count() == 20000L) // empty-projection path, per range
    assert(split.select(sum("id")).as[Long].head() ==
      whole.select(sum("id")).as[Long].head())
    assert(split.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 20000L))
  }

  test("planning serves file sizes from the MANIFEST: splits and " +
    "statistics issue ZERO per-file status calls on a size-bearing " +
    "table; a pre-size legacy manifest falls back (counted) and stays " +
    "correct") {
    val dir = Files.createTempDirectory("graft-dsv2size").toString
    val rows = (0L until 20000L).map(i => (i, s"s$i%09d" * 3)).toDF("id", "s")
    spark.conf.set("spark.hadoop.parquet.block.size", "4096")
    try SnapshotTable.commit(spark, rows.coalesce(1), dir)
    finally spark.conf.unset("spark.hadoop.parquet.block.size")
    // the manifest records real byte lengths
    val sizes = SnapshotTable.readSizes(dir, 1)
    assert(sizes.isDefined && sizes.get.length == 1)
    val rel = SnapshotTable.manifestFiles(dir, 1).head
    assert(sizes.get.head == new java.io.File(s"$dir/$rel").length())
    SnapshotScan.fsStatCalls.set(0L)
    // split planning (small maxSplitBytes forces the length lookup)...
    val split = spark.read.format("graft.sources.SnapshotSource")
      .option("maxSplitBytes", (16 * 1024).toString).load(dir)
    assert(split.rdd.getNumPartitions > 4)
    assert(split.count() == 20000L)
    // ...and CBO statistics (broadcast decision on a snapshot⋈fact
    // join forces estimateStatistics) both plan from manifest bytes
    val fact = (0L until 1000L).map(i => (i, i * 2)).toDF("id", "v")
    val joined = split.join(fact, "id")
    assert(joined.count() == 1000L)
    assert(SnapshotScan.fsStatCalls.get() == 0L,
      s"planning paid ${SnapshotScan.fsStatCalls.get()} status calls " +
        "on a size-bearing manifest")
    // legacy manifest (sizes hand-stripped): fallback stats the file,
    // the read stays exactly correct
    val mf = new java.io.File(dir, "_log/v00001.json")
    val json = new String(Files.readAllBytes(mf.toPath))
    Files.write(mf.toPath,
      json.replaceAll(""","sizes":\[[^\]]*\]""", "").getBytes)
    assert(SnapshotTable.readSizes(dir, 1).isEmpty)
    // (sum, not count: an unfiltered count(*) is answered from
    // manifest rows as a LocalScan and never plans files at all)
    val legacy = spark.read.format("graft.sources.SnapshotSource")
      .option("maxSplitBytes", (16 * 1024).toString).load(dir)
    assert(legacy.select(sum("id")).as[Long].head() ==
      (0L until 20000L).sum)
    assert(SnapshotScan.fsStatCalls.get() > 0L)
  }

  test("vectorized (default) and row-path reads agree on every type, " +
    "evolution null-fill included; the option switches paths") {
    val dir = Files.createTempDirectory("graft-dsv2vec").toString
    SnapshotTable.commit(spark,
      (0L until 300L).map(i => (i, s"v$i", i.toDouble / 3, i.toFloat,
        i % 2 == 0, i.toInt)).toDF("id", "s", "d", "f", "b", "i")
        .repartition(3), dir)
    SnapshotTable.commit(spark, // evolution: old files null-fill "tag"
      (300L until 360L).map(i => (i, s"v$i", i.toDouble / 3, i.toFloat,
        i % 2 == 0, i.toInt, s"t$i"))
        .toDF("id", "s", "d", "f", "b", "i", "tag").repartition(2), dir)
    def read(vectorized: Boolean) =
      spark.read.format("graft.sources.SnapshotSource")
        .option("vectorizedRead", vectorized.toString).load(dir)
    val vec = read(true)
      .as[(Long, String, Double, Float, Boolean, Int, Option[String])]
      .collect().toSet
    val row = read(false)
      .as[(Long, String, Double, Float, Boolean, Int, Option[String])]
      .collect().toSet
    assert(vec == row && vec.size == 360)
    assert(vec.count(_._7.isEmpty) == 300) // null-fill identical
    // the default path IS columnar (factory contract), row is the escape
    assert(new SnapshotReaderFactory(read(true).schema, vectorized = true)
      .supportColumnarReads(SnapshotFilePartition("x")))
    assert(!new SnapshotReaderFactory(read(true).schema, vectorized = false)
      .supportColumnarReads(SnapshotFilePartition("x")))
  }

  test("NESTED types through the native snapshot writer: arrays, maps, " +
    "structs (incl. empty / null / null-element shapes) roundtrip " +
    "bit-exact through BOTH read paths, and footerSchema inverts them") {
    val dir = Files.createTempDirectory("graft-dsv2nest").toString
    val rows: Seq[(Long, Seq[Float], Option[Seq[String]], Map[String, Long],
        (Long, String), Seq[Option[Long]])] =
      (0L until 200L).map { i =>
        (i,
          Seq(i.toFloat, i * 0.5f, -i.toFloat),
          i % 7 match {
            case 0 => None                    // null array
            case 1 => Some(Seq.empty[String]) // empty array
            case _ => Some(Seq(s"a$i", s"b$i"))
          },
          if (i % 5 == 0) Map.empty[String, Long]
          else Map(s"k$i" -> i, "shared" -> (i * 2)),
          (i * 3, s"s$i"),
          Seq(Some(i), None, Some(i + 1))) // null ELEMENTS
      }
    val df = rows.toDF("id", "emb", "tags", "counts", "st", "opt")
    df.write.format("graft.sources.SnapshotSource")
      .mode("append").save(dir)
    def read(vectorized: Boolean) =
      spark.read.format("graft.sources.SnapshotSource")
        .option("vectorizedRead", vectorized.toString).load(dir)
    val vec = read(true).as[(Long, Seq[Float], Option[Seq[String]],
      Map[String, Long], (Long, String), Seq[Option[Long]])]
      .collect().toSet
    val row = read(false).as[(Long, Seq[Float], Option[Seq[String]],
      Map[String, Long], (Long, String), Seq[Option[Long]])]
      .collect().toSet
    assert(vec == rows.toSet, "vectorized path diverged")
    assert(row == rows.toSet, "row path diverged")
    // footerSchema (the legacy-manifest fallback) inverts the layout
    val file = SnapshotTable.manifestFiles(dir, 1).head
    val st = SnapshotSource.footerSchema(s"$dir/$file")
    assert(st("emb").dataType == ArrayType(FloatType, containsNull = true))
    assert(st("tags").dataType ==
      ArrayType(StringType, containsNull = true))
    assert(st("counts").dataType ==
      MapType(StringType, LongType, valueContainsNull = true))
    assert(st("st").dataType.isInstanceOf[StructType])
    // array column survives an SQL aggregate over the snapshot scan
    read(true).createOrReplaceTempView("nest_t")
    assert(spark.sql(
      "SELECT sum(size(emb)) FROM nest_t").as[Long].head() == 600L)
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

  test("MERGE-ON-READ through the DSv2 source: dirty files read " +
    "position-filtered on the row path, clean files keep the " +
    "vectorized/split path, count(*) pushdown stays exact, SQL reads " +
    "and SQL DML see logical rows and DML folds the touched deletes") {
    val dir = Files.createTempDirectory("graft-dsv2mor").toString
    val st = SnapshotTable
    st.enableMergeOnRead(dir)
    st.commitMultiStats(spark,
      (0L until 200L).map(i => (i, i * 3)).toDF("id", "n"), dir,
      statsCols = Seq("id"))
    st.delete(spark, dir, col("id") % 4 === 1L) // 50 tombstones
    // DSv2 batch read applies the tombstones (vectorized default)
    val ds = load(dir)
    assert(ds.count() == 150L)
    assert(ds.where(col("id") % 4 === 1L).count() == 0L)
    assert(ds.agg(sum(col("n"))).head().getLong(0) ==
      (0L until 200L).filter(_ % 4 != 1L).map(_ * 3).sum)
    // row-path escape agrees
    assert(spark.read.format("graft.sources.SnapshotSource")
      .option("vectorizedRead", "false").load(dir).count() == 150L)
    // count(*) answers from the MANIFEST (rows − ndel): the plan is a
    // local scan, zero file IO
    val cnt = ds.groupBy().count()
    assert(cnt.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    assert(cnt.as[Long].head() == 150L)
    // min/max pushdown DECLINES while dirty (a tombstoned row may hold
    // the extremum) — answered from data, still exact
    assert(ds.agg(min(col("id"))).head().getLong(0) == 0L)
    assert(ds.agg(max(col("id"))).head().getLong(0) == 199L)
    // stats-pruned read over the dirty table stays exact
    assert(ds.where(col("id") < 8L).as[(Long, Long)].collect()
      .map(_._1).sorted.toSeq == Seq(0L, 2L, 3L, 4L, 6L, 7L))
    // SQL DML (CoW row-level path) on the MoR table reads logical rows
    // and FOLDS the touched files' deletes into its rewrite
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mor_v USING " +
      s"graft.sources.SnapshotSource OPTIONS (path '$dir')")
    spark.conf.set("spark.sql.catalog.morcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.morcat.root",
      new java.io.File(dir).getParent)
    val name = new java.io.File(dir).getName
    val v2 = st.versions(dir).last
    spark.sql(s"UPDATE morcat.`$name` SET n = -1 WHERE id = 100")
    val v3 = st.versions(dir).last
    // runtime group filtering scanned only the file holding id=100;
    // rewriting it FOLDED its tombstones (dirty shrinks, ndel drops),
    // every other dirty file carries its deletes
    assert(st.readDirty(dir, v3).size < st.readDirty(dir, v2).size)
    assert(st.readNdel(dir, v3) < st.readNdel(dir, v2))
    val after = load(dir)
    assert(after.count() == 150L)
    assert(after.where(col("id") === 100L).select("n")
      .as[Long].head() == -1L)
    assert(after.where(col("id") % 4 === 1L).count() == 0L)
  }

  test("vectorized read semantics follow the SESSION conf, not pinned " +
    "constants: sessionReadConfs captures overrides at scan build and " +
    "a non-default session still reads exactly") {
    val dir = Files.createTempDirectory("graft-dsv2conf").toString
    save((0L until 50L).toDF("id"), dir, "append")
    val before = (spark.conf.get("spark.sql.caseSensitive"),
      spark.conf.get("spark.sql.session.timeZone"))
    try {
      spark.conf.set("spark.sql.caseSensitive", "true")
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val confs = SnapshotSource.sessionReadConfs()
      assert(confs("spark.sql.caseSensitive") == "true")
      assert(confs("spark.sql.session.timeZone") == "America/New_York")
      // and the default (vectorized) read path stays exact under the
      // non-default session
      assert(load(dir).as[Long].collect().sorted.toSeq == (0L until 50L))
    } finally {
      spark.conf.set("spark.sql.caseSensitive", before._1)
      spark.conf.set("spark.sql.session.timeZone", before._2)
    }
  }
}
