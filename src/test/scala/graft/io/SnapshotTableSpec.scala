package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Snapshot-log laws: append/overwrite visibility, time travel, diff,
  * relocatability, loud failure on bad versions. */
class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def contents(dir: String, asOf: Option[Int]): Set[(Long, String)] =
    SnapshotTable.readSnapshot(spark, dir, asOf)
      .as[(Long, String)].collect().toSet

  test("append accumulates, overwrite replaces, every version stays readable") {
    val dir = Files.createTempDirectory("snap").toString
    val v1 = SnapshotTable.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    val v2 = SnapshotTable.commit(spark,
      Seq((3L, "c")).toDF("id", "s"), dir)
    val v3 = SnapshotTable.commit(spark,
      Seq((9L, "z")).toDF("id", "s"), dir, overwrite = true)
    assert((v1, v2, v3) == (1, 2, 3))
    assert(contents(dir, Some(1)) == Set((1L, "a"), (2L, "b")))
    assert(contents(dir, Some(2)) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(contents(dir, Some(3)) == Set((9L, "z")))
    assert(contents(dir, None) == Set((9L, "z"))) // latest = v3
    // append after overwrite builds on the overwritten state
    SnapshotTable.commit(spark, Seq((10L, "y")).toDF("id", "s"), dir)
    assert(contents(dir, None) == Set((9L, "z"), (10L, "y")))
    // history still intact after the fourth commit
    assert(contents(dir, Some(2)) == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("diff reports row-level added/removed between versions") {
    val dir = Files.createTempDirectory("snap-diff").toString
    SnapshotTable.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    SnapshotTable.commit(spark, Seq((2L, "b"), (5L, "e")).toDF("id", "s"),
      dir, overwrite = true)
    val d = SnapshotTable.diff(spark, dir, 1, 2, "id")
      .as[(Long, String)].collect().toSet
    assert(d == Set((5L, "added"), (1L, "removed")))
  }

  test("relative paths: a moved table directory still reads") {
    val dir = Files.createTempDirectory("snap-move").toString
    SnapshotTable.commit(spark, Seq((7L, "g")).toDF("id", "s"), dir)
    val moved = s"$dir-relocated"
    assert(new java.io.File(dir).renameTo(new java.io.File(moved)))
    assert(contents(moved, None) == Set((7L, "g")))
  }

  test("compact rewrites layout, never content; vacuum prunes history") {
    val dir = Files.createTempDirectory("snap-compact").toString
    // many tiny commits → many files
    (1L to 5L).foreach { i =>
      SnapshotTable.commit(spark,
        Seq((i, s"s$i")).toDF("id", "s").repartition(2), dir)
    }
    val before = contents(dir, None)
    val filesBefore = SnapshotTable.readSnapshot(spark, dir)
      .inputFiles.length
    val cv = SnapshotTable.compact(spark, dir, numFiles = 2)
    assert(cv == 6)
    assert(contents(dir, None) == before)              // content identical
    assert(SnapshotTable.readSnapshot(spark, dir).inputFiles.length == 2)
    assert(filesBefore > 2)
    // pre-compaction history still time-travels until vacuum
    assert(contents(dir, Some(3)).map(_._1) == Set(1L, 2L, 3L))
    val deleted = SnapshotTable.vacuum(dir, keep = 1)
    assert(deleted.nonEmpty)
    assert(SnapshotTable.versions(dir) == Seq(6))
    assert(contents(dir, None) == before)              // survivor intact
    intercept[IllegalArgumentException] {
      SnapshotTable.readSnapshot(spark, dir, Some(3)) // pruned: loud
    }
    // no orphaned data files: everything on disk is referenced
    val dataFiles = new java.io.File(s"$dir/data").listFiles()
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .count(_.getName.endsWith(".parquet"))
    assert(dataFiles == 2)
  }

  test("manifest stats prune files; results never change; stats survive append") {
    val dir = Files.createTempDirectory("snap-stats").toString
    val df = (0L until 400L).map(i => (i, s"s${i % 3}"))
      .toDF("id", "s")
    SnapshotTable.commitWithStats(spark,
      df.where(col("id") < 200).repartitionByRange(4, col("id")),
      dir, statsCol = Some("id"))
    SnapshotTable.commitWithStats(spark,
      df.where(col("id") >= 200).repartitionByRange(4, col("id")),
      dir, statsCol = Some("id"))
    val pruned = SnapshotTable.readSnapshotPruned(spark, dir, "id", 50, 99)
    val full = SnapshotTable.readSnapshot(spark, dir)
    // correctness: pruning == full scan + predicate
    assert(pruned.as[(Long, String)].collect().toSet ==
      full.where(col("id").between(50, 99)).as[(Long, String)]
        .collect().toSet)
    // the point: strictly fewer files planned (1-2 of 8 range files)
    assert(pruned.inputFiles.length < full.inputFiles.length)
    assert(pruned.inputFiles.length <= 2)
    // a range nobody holds: zero files, empty result, schema intact
    val none = SnapshotTable.readSnapshotPruned(spark, dir, "id", 5000, 6000)
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "s"))
    // stats-less append onto a stats table fails loudly, not silently
    intercept[IllegalStateException] {
      SnapshotTable.commitWithStats(spark, df.limit(5), dir,
        statsCol = None) // drops stats...
      SnapshotTable.commitWithStats(spark, df.limit(5), dir,
        statsCol = Some("id")) // ...so this append has nothing to carry
    }
  }

  test("compact with statsCol re-ranges files and keeps pruning tight") {
    val dir = Files.createTempDirectory("snap-stats-compact").toString
    (0 until 4).foreach { i =>
      SnapshotTable.commitWithStats(spark,
        (0L until 100L).map(j => (i * 100L + j, "x")).toDF("id", "s"),
        dir, statsCol = Some("id"))
    }
    SnapshotTable.compact(spark, dir, numFiles = 4, statsCol = Some("id"))
    val pruned = SnapshotTable.readSnapshotPruned(spark, dir, "id", 0, 99)
    assert(pruned.count() == 100)
    assert(pruned.inputFiles.length <= 2) // tight ranges post-compaction
  }

  test("unknown version and empty log fail loudly") {
    val dir = Files.createTempDirectory("snap-bad").toString
    intercept[IllegalArgumentException] {
      SnapshotTable.readSnapshot(spark, dir) // no log at all
    }
    SnapshotTable.commit(spark, Seq((1L, "a")).toDF("id", "s"), dir)
    intercept[IllegalArgumentException] {
      SnapshotTable.readSnapshot(spark, dir, Some(99))
    }
    // no leftover tmp manifests: the rename is the only publish path
    val stray = new java.io.File(s"$dir/_log").listFiles()
      .filter(_.getName.endsWith(".tmp"))
    assert(stray.isEmpty)
  }
}
