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

  test("optimistic concurrency: a commit racing an already-published " +
    "version fails loudly instead of clobbering it") {
    val dir = Files.createTempDirectory("snap-cas").toString
    SnapshotTable.commit(spark, Seq((1L, "a")).toDF("id", "s"), dir)
    val winner = new java.io.File(s"$dir/_log/v00001.json")
    val before = java.nio.file.Files.readAllBytes(winner.toPath).toSeq
    // the loser: a writer that computed the same next version (1) and
    // reaches the publish step after the winner's link landed
    intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.writeManifest(dir, 1, "append", Seq("data/v00001/x.parquet"))
    }
    // the winner's manifest is byte-identical — nothing clobbered
    assert(java.nio.file.Files.readAllBytes(winner.toPath).toSeq == before)
    // and no stray tmp manifest left behind by the loser
    assert(new java.io.File(s"$dir/_log").listFiles()
      .forall(!_.getName.endsWith(".tmp")))
    // the table still reads
    assert(SnapshotTable.readSnapshot(spark, dir).count() == 1)
  }

  test("schema evolution: appends add columns, old files null-fill, " +
    "history keeps its own schema, type changes fail loudly") {
    val dir = Files.createTempDirectory("snap-evolve").toString
    SnapshotTable.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    // v2 adds a column: zero data rewritten, v1's files just null-fill it
    SnapshotTable.commit(spark,
      Seq((3L, "c", 0.5)).toDF("id", "s", "score"), dir)
    val latest = SnapshotTable.readSnapshot(spark, dir)
    assert(latest.columns.toSeq == Seq("id", "s", "score"))
    assert(latest.as[(Long, String, Option[Double])].collect().toSet ==
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(0.5))))
    // time travel reads v1 with the schema it HAD then
    assert(SnapshotTable.readSnapshot(spark, dir, Some(1))
      .columns.toSeq == Seq("id", "s"))
    // an append may also OMIT known columns (its files null-fill them)
    SnapshotTable.commit(spark, Seq(Tuple1(4L)).toDF("id"), dir)
    assert(SnapshotTable.readSnapshot(spark, dir)
      .where(col("id") === 4L)
      .as[(Long, Option[String], Option[Double])].collect().toSeq ==
      Seq((4L, None, None)))
    // a type change is refused, not coerced
    intercept[IllegalArgumentException] {
      SnapshotTable.commit(spark, Seq((5L, 7L)).toDF("id", "s"), dir)
    }
    // overwrite resets the schema
    SnapshotTable.commit(spark, Seq((9L, true)).toDF("id", "flag"), dir,
      overwrite = true)
    assert(SnapshotTable.readSnapshot(spark, dir)
      .columns.toSeq == Seq("id", "flag"))
  }

  test("copy-on-write delete rewrites only touched files and keeps history") {
    val dir = Files.createTempDirectory("snap-delete").toString
    // two disjoint-range commits -> the delete can only touch one side
    SnapshotTable.commit(spark,
      (0L until 50L).map(i => (i, if (i % 10 == 0) null else s"s$i"))
        .toDF("id", "s").coalesce(1), dir)
    SnapshotTable.commit(spark,
      (50L until 100L).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1), dir)
    val beforeFiles = SnapshotTable.readSnapshot(spark, dir).inputFiles.toSet
    val v3 = SnapshotTable.delete(spark, dir, col("id") < 40 && col("s").isNotNull)
    assert(v3 == 3)
    val after = SnapshotTable.readSnapshot(spark, dir)
    // DELETE semantics: predicate-true rows gone; false OR NULL rows stay
    val ids = after.select("id").as[Long].collect().toSet
    assert(ids == ((0L until 40L).filter(_ % 10 == 0) ++ (40L until 100L)).toSet)
    // the untouched 50-99 file is carried by REFERENCE, not rewritten
    assert(after.inputFiles.toSet.intersect(beforeFiles).size == 1)
    // pre-delete history still time-travels
    assert(SnapshotTable.readSnapshot(spark, dir, Some(2)).count() == 100)
    // a match-nothing delete is a metadata-only commit: same files
    val v4 = SnapshotTable.delete(spark, dir, col("id") > 5000)
    assert(SnapshotTable.readSnapshot(spark, dir, Some(v4)).inputFiles.toSet ==
      after.inputFiles.toSet)
    // deleting every row: an empty but still-readable table (the
    // rewrite keeps a schema-bearing empty file), history intact
    val v5 = SnapshotTable.delete(spark, dir, lit(true))
    val empty = SnapshotTable.readSnapshot(spark, dir, Some(v5))
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "s"))
    assert(SnapshotTable.readSnapshot(spark, dir, Some(v4)).count() == ids.size)
  }

  test("copy-on-write update: assignment on predicate-true rows only, " +
    "untouched files carried, type drift and unknown columns refused") {
    val dir = Files.createTempDirectory("snap-update").toString
    SnapshotTable.commit(spark,
      (0L until 50L).map(i => (i, if (i % 10 == 0) null else s"s$i", i * 2))
        .toDF("id", "s", "n").coalesce(1), dir)
    SnapshotTable.commit(spark,
      (50L until 100L).map(i => (i, s"s$i", i * 2)).toDF("id", "s", "n")
        .coalesce(1), dir)
    val beforeFiles = SnapshotTable.readSnapshot(spark, dir).inputFiles.toSet
    SnapshotTable.update(spark, dir, col("id") < 40 && col("s").isNotNull,
      Map("n" -> (col("n") + 1000L)))
    val after = SnapshotTable.readSnapshot(spark, dir)
    val rows = after.select("id", "n").as[(Long, Long)].collect().toMap
    (0L until 100L).foreach { i =>
      val expect = if (i < 40 && i % 10 != 0) i * 2 + 1000 else i * 2
      assert(rows(i) == expect, s"id $i") // NULL-predicate rows untouched
    }
    assert(after.count() == 100)                       // UPDATE never drops
    // second wave's file carried by reference
    assert(after.inputFiles.toSet.intersect(beforeFiles).size == 1)
    // history: the pre-update version still shows the old values
    assert(SnapshotTable.readSnapshot(spark, dir, Some(2))
      .where(col("id") === 1L).select("n").as[Long].head() == 2L)
    intercept[IllegalArgumentException] {
      SnapshotTable.update(spark, dir, col("id") < 5,
        Map("n" -> lit("oops")))                       // type change
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.update(spark, dir, col("id") < 5,
        Map("nope" -> lit(1L)))                        // unknown column
    }
  }

  test("merge into: matched updates win column-wise, unmatched insert, " +
    "untouched files carried, duplicate-key and schema-drift sources refused") {
    val dir = Files.createTempDirectory("snap-merge").toString
    SnapshotTable.commit(spark,
      (0L until 50L).map(i => (i, s"s$i", i * 2)).toDF("id", "s", "n")
        .coalesce(1), dir)
    SnapshotTable.commit(spark,
      (50L until 100L).map(i => (i, s"s$i", i * 2)).toDF("id", "s", "n")
        .coalesce(1), dir)
    val beforeFiles = SnapshotTable.readSnapshot(spark, dir).inputFiles.toSet
    // source touches only the first wave's keys + inserts a new key;
    // id 10 carries a NULL payload column -> keeps the base value
    val source = Seq(
      (10L, Option.empty[String], Option(999L)),  // partial: s stays s10
      (20L, Option("S20"), Option(777L)),         // full update
      (200L, Option("NEW"), Option(1L)))          // unmatched -> insert
      .toDF("id", "s", "n")
    val v = SnapshotTable.merge(spark, dir, source, Seq("id"))
    assert(v == 3)
    val after = SnapshotTable.readSnapshot(spark, dir)
      .select("id", "s", "n").as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(after(10L) == (("s10", 999L)))  // NULL source col kept base s
    assert(after(20L) == (("S20", 777L)))
    assert(after(200L) == (("NEW", 1L)))
    assert(after(30L) == (("s30", 60L)))   // untouched row in touched file
    assert(after(60L) == (("s60", 120L)))  // carried file
    assert(after.size == 101)
    // second wave's file carried by reference
    assert(SnapshotTable.readSnapshot(spark, dir).inputFiles.toSet
      .intersect(beforeFiles).size == 1)
    // pre-merge history intact
    assert(SnapshotTable.readSnapshot(spark, dir, Some(2)).count() == 100)
    intercept[IllegalArgumentException] {   // duplicate source keys
      SnapshotTable.merge(spark, dir,
        Seq((1L, "a", 1L), (1L, "b", 2L)).toDF("id", "s", "n"), Seq("id"))
    }
    intercept[IllegalArgumentException] {   // schema drift
      SnapshotTable.merge(spark, dir,
        Seq((1L, "a")).toDF("id", "s"), Seq("id"))
    }
  }

  test("write-audit-publish: failing audit unstages and publishes nothing; " +
    "passing audit publishes the staged files") {
    val dir = Files.createTempDirectory("snap-wap").toString
    val checks = Seq(graft.ops.Expectations.RowCheck("n_nonneg", col("n") >= 0))
    val uniq = Seq(graft.ops.Expectations.UniqueCheck("id_unique", Seq("id")))
    val bad = Seq((1L, -5L), (2L, 3L)).toDF("id", "n")
    val (v1, r1) = SnapshotTable.commitAudited(spark, bad, dir, checks, uniq)
    assert(v1.isEmpty)
    assert(r1.where(col("check_name") === "n_nonneg")
      .select("violations").as[Long].head() == 1L)
    assert(SnapshotTable.versions(dir).isEmpty)       // log untouched
    // staged files removed: nothing under data/
    val dataDirs = Option(new java.io.File(s"$dir/data").listFiles())
      .getOrElse(Array.empty)
    assert(dataDirs.isEmpty)
    val good = Seq((1L, 5L), (2L, 3L)).toDF("id", "n")
    val (v2, r2) = SnapshotTable.commitAudited(spark, good, dir, checks, uniq)
    assert(v2.contains(1))
    assert(r2.where(!col("pass")).count() == 0)
    assert(SnapshotTable.readSnapshot(spark, dir)
      .as[(Long, Long)].collect().toSet == Set((1L, 5L), (2L, 3L)))
    // a failing audited APPEND leaves the published version intact
    val (v3, _) = SnapshotTable.commitAudited(spark, bad, dir, checks, uniq)
    assert(v3.isEmpty && SnapshotTable.versions(dir) == Seq(1))
  }

  test("write-audit-publish on a PARTITIONED table: a passing audit " +
    "publishes value-pure tuples, a failing audit unstages everything") {
    val dir = Files.createTempDirectory("snap-wapp").toString
    val checks = Seq(graft.ops.Expectations.RowCheck("n_nonneg", col("n") >= 0))
    val good = (0L until 60L).map(i => (i, s"g${i % 3}", i))
      .toDF("id", "grp", "n")
    val (v1, r1) = SnapshotTable.commitAudited(spark, good, dir, checks,
      partCols = Seq("grp"))
    assert(v1.contains(1) && r1.where(!col("pass")).count() == 0)
    assert(SnapshotTable.partitionColumns(dir, 1) == Seq("grp"))
    assert(SnapshotTable.readPartValues(dir, 1).get.flatten.flatten.toSet ==
      Set("g0", "g1", "g2"))
    // the audited publish serves the partition tier at once
    assert(SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("grp" -> "g1")).count() == 20L)
    // failing audited partitioned append: unstaged, log intact
    val bad = Seq((100L, "g0", -1L)).toDF("id", "grp", "n")
    val (v2, _) = SnapshotTable.commitAudited(spark, bad, dir, checks,
      partCols = Seq("grp"))
    assert(v2.isEmpty && SnapshotTable.versions(dir) == Seq(1))
    assert(SnapshotTable.readSnapshot(spark, dir).count() == 60L)
  }

  test("model-based: random append/overwrite/delete/update/merge sequences " +
    "match an in-memory multiset model at every version") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 2).foreach { trial =>
      val dir = Files.createTempDirectory(s"snap-model$trial").toString
      var model = Vector.empty[(Long, String, Long)]
      var nextId = 0L
      def freshRows(k: Int): Vector[(Long, String, Long)] = {
        val rows = (0 until k).map { i =>
          (nextId + i, s"s${nextId + i}", rnd.nextInt(100).toLong)
        }.toVector
        nextId += k
        rows
      }
      val seed = freshRows(20)
      SnapshotTable.commit(spark,
        seed.toDF("id", "s", "n").repartition(2), dir)
      model = seed
      (1 to 10).foreach { step =>
        rnd.nextInt(5) match {
          case 0 => // append
            val rows = freshRows(5 + rnd.nextInt(10))
            SnapshotTable.commit(spark,
              rows.toDF("id", "s", "n").repartition(1 + rnd.nextInt(2)), dir)
            model = model ++ rows
          case 1 => // overwrite
            val rows = freshRows(10)
            SnapshotTable.commit(spark, rows.toDF("id", "s", "n"), dir,
              overwrite = true)
            model = rows
          case 2 => // delete a residue class
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            SnapshotTable.delete(spark, dir,
              pmod(col("id"), lit(m.toLong)) === r.toLong)
            model = model.filterNot { case (id, _, _) => id % m == r }
          case 3 => // update a residue class
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            SnapshotTable.update(spark, dir,
              pmod(col("id"), lit(m.toLong)) === r.toLong,
              Map("n" -> (col("n") + 1000L)))
            model = model.map { case t @ (id, s, n) =>
              if (id % m == r) (id, s, n + 1000L) else t
            }
          case 4 => // merge: update a sample of existing keys + insert
            val existing = rnd.shuffle(model.map(_._1).distinct)
              .take(math.min(5, model.size))
            val upd = existing.map(id => (id, s"m$id", -1L))
            val ins = freshRows(3)
            SnapshotTable.merge(spark, dir,
              (upd ++ ins).toDF("id", "s", "n"), Seq("id"))
            val updMap = upd.map(u => u._1 -> u).toMap
            model = model.map { case t @ (id, _, _) =>
              updMap.getOrElse(id, t)
            } ++ ins
        }
        val got = SnapshotTable.readSnapshot(spark, dir)
          .as[(Long, String, Long)].collect().toVector.sorted
        assert(got == model.sorted, s"trial $trial step $step")
      }
    }
  }

  test("delete carries manifest stats; pruning stays correct after DML") {
    val dir = Files.createTempDirectory("snap-delete-stats").toString
    SnapshotTable.commitWithStats(spark,
      (0L until 400L).map(i => (i, s"s$i")).toDF("id", "s")
        .repartitionByRange(4, col("id")), dir, statsCol = Some("id"))
    SnapshotTable.delete(spark, dir, col("id").between(100, 149))
    val pruned = SnapshotTable.readSnapshotPruned(spark, dir, "id", 100, 199)
    assert(pruned.select("id").as[Long].collect().toSet ==
      (150L until 200L).toSet)
    // stats survived the DML commit: strictly fewer files planned
    assert(pruned.inputFiles.length <
      SnapshotTable.readSnapshot(spark, dir).inputFiles.length)
  }

  test("bloom sidecar: point lookups prune files, absent keys return " +
    "empty, answers identical to a plain filter") {
    val dir = Files.createTempDirectory("graft-bloomspec").toString
    val rows = (0L until 400L).map(i => (i, s"v$i")).toDF("id", "payload")
    // hash layout: min/max stats would prune nothing
    SnapshotTable.commit(spark, rows.where(col("id") % 2 === 0)
      .repartition(4), dir)
    SnapshotTable.commit(spark, rows.where(col("id") % 2 === 1)
      .repartition(4), dir)
    val allFiles = SnapshotTable.readSnapshot(spark, dir)
      .inputFiles.length
    // no index yet: planning falls back to every file
    assert(SnapshotBloom.candidateFiles(dir, "id", 7L).size == allFiles)
    SnapshotBloom.buildIndex(spark, dir, "id", fpp = 1e-4,
      expectedItemsPerFile = 10000L)
    // a point key lives in exactly one file; at fpp 1e-4 over 8 files
    // the expected false-positive count is ~0 — require REAL pruning
    val kept = SnapshotBloom.candidateFiles(dir, "id", 7L)
    assert(kept.nonEmpty && kept.size < allFiles,
      s"bloom pruned nothing: ${kept.size} of $allFiles")
    val got = SnapshotBloom.pointLookup(spark, dir, "id", 7L)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((7L, "v7")))
    assert(SnapshotBloom.pointLookup(spark, dir, "id", 123456L)
      .count() == 0)
  }

  test("bloom sidecar: zero-row commits don't break the build, and an " +
    "empty version round-trips through the sidecar") {
    val dir = Files.createTempDirectory("graft-bloomempty").toString
    val rows = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "payload")
    SnapshotTable.commit(spark, rows.repartition(4), dir)
    // an APPEND of an empty frame: any zero-row part file it stages has
    // no groupBy(input_file_name) row — buildIndex must emit an
    // always-prune empty bloom for it, not throw
    SnapshotTable.commit(spark, rows.where(lit(false)), dir)
    SnapshotBloom.buildIndex(spark, dir, "id", fpp = 1e-4,
      expectedItemsPerFile = 10000L)
    val got = SnapshotBloom.pointLookup(spark, dir, "id", 7L)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((7L, "v7")))
    // a table whose only commit is empty: the sidecar's files array is
    // legitimately empty ("".split(",") must not fabricate one entry)
    val dir2 = Files.createTempDirectory("graft-bloomempty2").toString
    SnapshotTable.commit(spark, rows.where(lit(false)), dir2)
    SnapshotBloom.buildIndex(spark, dir2, "id")
    assert(SnapshotBloom.candidateFiles(dir2, "id", 7L).isEmpty)
    assert(SnapshotBloom.pointLookup(spark, dir2, "id", 7L).count() == 0)
  }

  test("TIMESTAMP AS OF: between-commits resolves down, boundary is " +
    "inclusive, future reads latest, pre-first and untimestamped logs " +
    "refuse loudly") {
    val dir = Files.createTempDirectory("snap-ts").toString
    locally {
      var tick = 0L
      SnapshotTable.clock.withValue(() => { tick += 1; tick * 1000L }) {
        SnapshotTable.commit(spark, Seq((1L, "a")).toDF("id", "s"), dir)
        SnapshotTable.commit(spark, Seq((2L, "b")).toDF("id", "s"), dir)
        SnapshotTable.commit(spark, Seq((9L, "z")).toDF("id", "s"), dir,
          overwrite = true): Unit
      }
    }
    assert(SnapshotTable.commitTimestamp(dir, 2).contains(2000L))
    assert(SnapshotTable.resolveTimestamp(dir, 1500L) == 1)
    assert(SnapshotTable.resolveTimestamp(dir, 2000L) == 2) // inclusive
    assert(SnapshotTable.resolveTimestamp(dir, 999999L) == 3)
    val pre = intercept[IllegalArgumentException](
      SnapshotTable.resolveTimestamp(dir, 500L))
    assert(pre.getMessage.contains("before the table's first"))
    // a hand-written manifest with no ts field = a pre-upgrade log
    val dir2 = Files.createTempDirectory("snap-notz").toString
    SnapshotTable.commit(spark, Seq((1L, "a")).toDF("id", "s"), dir2)
    val mf = new java.io.File(dir2, "_log/v00001.json")
    val json = new String(Files.readAllBytes(mf.toPath))
    Files.write(mf.toPath,
      json.replaceAll(""""ts":\d+,""", "").getBytes)
    val old = intercept[IllegalArgumentException](
      SnapshotTable.resolveTimestamp(dir2, 999999L))
    assert(old.getMessage.contains("use VERSION AS OF"))
  }

  test("vacuumOlderThan drops at-or-before the horizon, never the " +
    "current version; retained versions stay exactly readable and " +
    "below-horizon reads fail naming the vacuum") {
    val dir = Files.createTempDirectory("snap-vage").toString
    locally {
      var tick = 0L
      SnapshotTable.clock.withValue(() => { tick += 1; tick * 1000L }) {
        SnapshotTable.commit(spark, Seq((1L, "a")).toDF("id", "s"), dir)
        SnapshotTable.commit(spark, Seq((2L, "b")).toDF("id", "s"), dir)
        SnapshotTable.commit(spark, Seq((9L, "z")).toDF("id", "s"), dir,
          overwrite = true)
        SnapshotTable.commit(spark, Seq((10L, "y")).toDF("id", "s"), dir): Unit
      }
    }
    // horizon at v2's timestamp: v1, v2 drop; the overwrite and the
    // append on top survive, exactly readable
    val deleted = SnapshotTable.vacuumOlderThan(dir, 2000L)
    assert(deleted.nonEmpty) // v1/v2's files are referenced nowhere else
    assert(SnapshotTable.versions(dir) == Seq(3, 4))
    assert(contents(dir, Some(3)) == Set((9L, "z")))
    assert(contents(dir, None) == Set((9L, "z"), (10L, "y")))
    val below = intercept[IllegalArgumentException](
      SnapshotTable.readSnapshot(spark, dir, Some(2)).collect())
    assert(below.getMessage.toLowerCase.contains("vacuum"))
    // a horizon past every commit still keeps the current version: age
    // never vacuums the table itself away
    assert(SnapshotTable.vacuumOlderThan(dir, 999999L).isEmpty ||
      SnapshotTable.versions(dir).nonEmpty)
    assert(SnapshotTable.versions(dir) == Seq(4))
    assert(contents(dir, None) == Set((9L, "z"), (10L, "y")))
  }

  test("manifests record per-file row counts: appends carry history's " +
    "counts, DML recounts only rewritten files, manifestCount/MinMax " +
    "answer without data IO, pre-upgrade logs answer None") {
    val dir = Files.createTempDirectory("snap-rows").toString
    SnapshotTable.commitWithStats(spark,
      (0L until 10L).map(i => (i, s"a$i")).toDF("id", "s"), dir,
      statsCol = Some("id"))
    SnapshotTable.commitWithStats(spark,
      (10L until 15L).map(i => (i, s"a$i")).toDF("id", "s"), dir,
      statsCol = Some("id"))
    assert(SnapshotTable.readRows(dir, 1).exists(_.sum == 10L))
    assert(SnapshotTable.manifestCount(dir, 2).contains(15L))
    assert(SnapshotTable.manifestMinMax(dir, 2).contains(("id", 0L, 14L)))
    // CoW delete: counts stay exact after a partial rewrite
    SnapshotTable.delete(spark, dir, col("id") < 3L)
    assert(SnapshotTable.manifestCount(dir, 3).contains(12L))
    // restore carries counts without touching data
    SnapshotTable.restore(dir, 2)
    assert(SnapshotTable.manifestCount(dir, 4).contains(15L))
    // a pre-upgrade manifest answers None — decline, never estimate
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
    assert(SnapshotTable.manifestCount(dir, 2).isEmpty)
    assert(SnapshotTable.manifestMinMax(dir, 2).isEmpty)
  }

  test("hive-style partition columns: value-pure files, exact manifest " +
    "pruning, partition-column-as-data, DML/compact/restore keep the " +
    "layout, append with different partitioning refuses") {
    val dir = Files.createTempDirectory("snap-part").toString
    val df = (0L until 300L).map(i =>
      (i, s"src${i % 3}", i * 2)).toDF("id", "source", "n")
    SnapshotTable.commitPartitioned(spark, df, dir, Seq("source"),
      statsCols = Seq("id"))
    assert(SnapshotTable.partitionColumns(dir, 1) == Seq("source"))
    val files = SnapshotTable.manifestFiles(dir, 1)
    val pvals = SnapshotTable.readPartValues(dir, 1).get
    assert(pvals.length == files.length)
    assert(pvals.flatten.flatten.toSet == Set("src0", "src1", "src2"))
    // value purity: each file's recorded value matches ALL its rows
    files.zip(pvals).foreach { case (f, Seq(v)) =>
      val got = spark.read.parquet(s"$dir/$f").select("source")
        .distinct().as[String].collect().toSeq
      assert(got == Seq(v.get), s"$f not value-pure")
    }
    // partition-column-as-data: the column reads back from file bytes
    assert(SnapshotTable.readSnapshot(spark, dir)
      .where(col("source") === "src1").count() == 100L)
    // exact pruning by value
    val kept = SnapshotTable.manifestFilesPruned(dir, 1, Map.empty,
      Map("source" -> Set(Option("src1"))))
    assert(kept.nonEmpty && kept.length < files.length)
    assert(kept.forall(f => files.zip(pvals).toMap.apply(f) ==
      Seq(Some("src1"))))
    // pruned read is value-exact
    val got = SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("source" -> "src2")).as[(Long, String, Long)].collect().toSet
    assert(got == df.where(col("source") === "src2")
      .as[(Long, String, Long)].collect().toSet)
    // append must keep the partitioning — same cols ok, others refuse
    SnapshotTable.commitPartitioned(spark,
      (300L until 330L).map(i => (i, s"src${i % 3}", i * 2))
        .toDF("id", "source", "n"), dir, Seq("source"),
      statsCols = Seq("id"))
    assert(SnapshotTable.readPartValues(dir, 2).get.length ==
      SnapshotTable.manifestFiles(dir, 2).length)
    val wrongCols = intercept[IllegalArgumentException] {
      SnapshotTable.commitPartitioned(spark,
        (330L until 340L).map(i => (i, s"src${i % 3}", i * 2))
          .toDF("id", "source", "n"), dir, Seq("id"))
    }
    assert(wrongCols.getMessage.contains("partitioned by"))
    val plainAppend = intercept[IllegalArgumentException] {
      SnapshotTable.commit(spark,
        (340L until 350L).map(i => (i, s"src${i % 3}", i * 2))
          .toDF("id", "source", "n"), dir)
    }
    assert(plainAppend.getMessage.contains("partitioned"))
    // CoW delete keeps value purity + carried values (+ an UPDATE that
    // MOVES rows across partition values re-files them correctly)
    SnapshotTable.delete(spark, dir, col("id") < 30L)
    assert(SnapshotTable.partitionColumns(dir, 3) == Seq("source"))
    assert(SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("source" -> "src0")).count() ==
      df.where(col("source") === "src0" && col("id") >= 30L).count() + 10)
    SnapshotTable.update(spark, dir, col("id") === 31L,
      Map("source" -> lit("src2")))
    val moved = SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("source" -> "src2")).where(col("id") === 31L)
    assert(moved.count() == 1L)
    // compact preserves partitioning and stats; restore carries values
    SnapshotTable.compact(spark, dir, numFiles = 2)
    val curV = SnapshotTable.versions(dir).last
    assert(SnapshotTable.partitionColumns(dir, curV) == Seq("source"))
    assert(SnapshotTable.statsColumns(dir, curV) == Seq("id"))
    SnapshotTable.restore(dir, 2)
    val resV = SnapshotTable.versions(dir).last
    assert(SnapshotTable.partitionColumns(dir, resV) == Seq("source"))
    assert(SnapshotTable.readPartValues(dir, resV).get.length ==
      SnapshotTable.manifestFiles(dir, resV).length)
  }

  test("CONCURRENT appends: optimistic CAS retry — racing commits all " +
    "succeed with stats carried onto whichever base won; the final " +
    "table is the union and every intermediate version time-travels") {
    val dir = Files.createTempDirectory("snap-conc").toString
    val n = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    implicit val ec =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futs = (0 until n).map { k =>
      scala.concurrent.Future {
        SnapshotTable.commitMultiStats(spark,
          (0L until 50L).map(i => (k * 1000L + i, s"t$k"))
            .toDF("id", "tag"),
          dir, statsCols = Seq("id"))
      }
    }
    val vs = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration(180, "seconds"))
    pool.shutdown()
    assert(vs.sorted == (1 to n), s"versions: $vs")
    assert(SnapshotTable.readSnapshot(spark, dir).count() == n * 50L)
    assert(SnapshotTable.readSnapshot(spark, dir)
      .select("tag").distinct().count() == n.toLong)
    // the log is a strict chain: each version adds exactly one batch,
    // stats cover every file at every version
    (1 to n).foreach { v =>
      assert(SnapshotTable.readSnapshot(spark, dir, Some(v)).count() ==
        v * 50L)
      assert(SnapshotTable.readAllStats(dir, v).head._2.length ==
        SnapshotTable.manifestFiles(dir, v).length)
    }
    // overwrite does NOT retry: losing the race surfaces loudly
    // (decide-against-stale-state must not silently replace new data)
    // — simulated by publishing a conflicting version mid-flight is
    // not deterministically schedulable here; the contract is pinned
    // by the retry guard matching appends only (source-reviewed).
  }

  test("CHANGE-DATA-FEED: appends feed inserts, CoW delete/update/merge " +
    "feed recorded pre/post images, metadata partition delete feeds " +
    "dropped files, compaction feeds nothing, un-recorded DML refuses") {
    val dir = Files.createTempDirectory("snap-cdf").toString
    SnapshotTable.enableChangeFeed(dir)
    val v1 = (0L until 100L).map(i => (i, s"g${i % 4}", i * 2))
      .toDF("id", "grp", "n")
    SnapshotTable.commit(spark, v1, dir)                      // v1 append
    SnapshotTable.delete(spark, dir, col("id") < 10L)         // v2 delete
    SnapshotTable.update(spark, dir, col("id") === 50L,       // v3 update
      Map("n" -> lit(999L)))
    val src = Seq((20L, "gX", -1L), (21L, "gX", -2L),         // 2 matched
      (500L, "gN", 1L), (501L, "gN", 2L))                     // 2 new
      .toDF("id", "grp", "n")
    SnapshotTable.merge(spark, dir, src, Seq("id"))           // v4 merge
    SnapshotTable.compact(spark, dir, numFiles = 1)           // v5 compact
    val feed = SnapshotTable.readChangeFeed(spark, dir, 1)
      .select("id", "grp", "n", "_change_type", "_commit_version")
      .as[(Long, String, Long, String, Long)].collect()
    val byV = feed.groupBy(_._5)
    assert(byV(1L).forall(_._4 == "insert") && byV(1L).length == 100)
    assert(byV(2L).forall(r => r._4 == "delete" && r._1 < 10L) &&
      byV(2L).length == 10)
    assert(byV(3L).map(r => (r._4, r._3)).toSet ==
      Set(("update_preimage", 100L), ("update_postimage", 999L)))
    assert(byV(4L).count(_._4 == "update_preimage") == 2)
    assert(byV(4L).count(_._4 == "update_postimage") == 2)
    assert(byV(4L).filter(_._4 == "insert").map(_._1).toSet ==
      Set(500L, 501L))
    assert(!byV.contains(5L)) // compaction: no logical change
    // REPLAY: key-wise last change reconstructs the latest version
    val replayed = feed.filter(r =>
        r._4 == "insert" || r._4 == "update_postimage" || r._4 == "delete")
      .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._5) }
      .filter(_._4 != "delete").map(r => (r._1, r._2, r._3)).toSet
    val latest = SnapshotTable.readSnapshot(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    assert(replayed == latest)
    // STREAMING: the same feed through readStream + readChangeFeed
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .load(dir)
      .writeStream.format("memory").queryName("cdfstream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.sql(
      "SELECT id, grp, n, _change_type, _commit_version FROM cdfstream")
      .as[(Long, String, Long, String, Long)].collect().toSet
    assert(streamed == feed.toSet)
    // METADATA partition delete: dropped files feed as deletes, no
    // sidecar was ever written
    val dir2 = Files.createTempDirectory("snap-cdf2").toString
    SnapshotTable.enableChangeFeed(dir2)
    SnapshotTable.commitPartitioned(spark, v1, dir2, Seq("grp"))
    SnapshotTable.deletePartitions(dir2, Map("grp" -> "g1"))
    val feed2 = SnapshotTable.readChangeFeed(spark, dir2, 2)
    assert(feed2.where(col("_change_type") === "delete").count() == 25L)
    assert(SnapshotTable.changeFiles(dir2, 2).isEmpty)
    // BATCH SQL spelling: a USING view (or spark.read) with
    // readChangeFeed reads the same feed, fully distributed
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdf_v USING " +
      s"graft.sources.SnapshotSource OPTIONS (path '$dir', " +
      "readChangeFeed 'true', startingVersion '1')")
    val viaSql = spark.sql(
      "SELECT id, grp, n, _change_type, _commit_version FROM cdf_v")
      .as[(Long, String, Long, String, Long)].collect().toSet
    assert(viaSql == feed.toSet)
    // ... and an endingVersion bound cuts the range
    val bounded = spark.read.format("graft.sources.SnapshotSource")
      .option("readChangeFeed", "true").option("startingVersion", 2)
      .option("endingVersion", 3).load(dir)
    assert(bounded.select("_commit_version").distinct()
      .as[Long].collect().toSet == Set(2L, 3L))
    // vacuum removes dropped versions' sidecars with them; the feed
    // still reads from retained versions
    SnapshotTable.vacuum(dir, 2) // keeps v4 (merge) + v5 (compact)
    assert(SnapshotTable.changeFiles(dir, 2).isEmpty &&
      SnapshotTable.changeFiles(dir, 3).isEmpty)
    assert(SnapshotTable.readChangeFeed(spark, dir, 4)
      .where(col("_change_type") === "insert").count() == 2L)
    // a spec-EVOLUTION commit is an append to the feed: its added
    // files feed as inserts, the carried (unknown-tuple) files do not
    // re-feed
    val dir4 = Files.createTempDirectory("snap-cdf4").toString
    SnapshotTable.enableChangeFeed(dir4)
    SnapshotTable.commit(spark, v1.where(col("id") < 40L), dir4)
    SnapshotTable.commitPartitioned(spark, v1.where(col("id") >= 40L),
      dir4, Seq("grp"), evolveSpec = true)
    val f4 = SnapshotTable.readChangeFeed(spark, dir4, 1)
    assert(f4.where(col("_change_type") === "insert").count() == 100L)
    assert(f4.where(col("_commit_version") === 2L).count() == 60L)
    // a DML version recorded before enabling the feed refuses loudly
    val dir3 = Files.createTempDirectory("snap-cdf3").toString
    SnapshotTable.commit(spark, v1, dir3)
    SnapshotTable.update(spark, dir3, col("id") === 1L,
      Map("n" -> lit(0L)))
    val err = intercept[IllegalStateException] {
      SnapshotTable.readChangeFeed(spark, dir3, 1).collect()
    }
    assert(err.getMessage.contains("no change sidecar"))
  }

  test("CDF postimages are the COMMITTED rows: an UPDATE whose " +
    "predicate references the assigned column still records the new " +
    "values, and a MERGE with a partial-row source records the " +
    "coalesced rows, not the raw source") {
    val dir = Files.createTempDirectory("snap-cdf-post").toString
    SnapshotTable.enableChangeFeed(dir)
    val v1 = (0L until 40L).map(i => (i, s"g${i % 4}", i * 10))
      .toDF("id", "grp", "n")
    SnapshotTable.commit(spark, v1, dir)
    // the canonical shape: SET n=999 WHERE n=100 — the predicate is on
    // the ASSIGNED column and must see PRE-assignment values; the
    // postimage is the committed (new) value
    SnapshotTable.update(spark, dir, col("n") === 100L,
      Map("n" -> lit(999L)))                                     // v2
    val f2 = SnapshotTable.readChangeFeed(spark, dir, 2, Some(2))
      .select("id", "n", "_change_type")
      .as[(Long, Long, String)].collect().toSet
    assert(f2 == Set((10L, 100L, "update_preimage"),
      (10L, 999L, "update_postimage")), s"got $f2")
    // MERGE with a PARTIAL source row (NULL column keeps the base
    // value): the feed's postimage must equal the committed table row
    val src = Seq((20L, null.asInstanceOf[String], -1L),
      (900L, "gZ", 5L)).toDF("id", "grp", "n")
    SnapshotTable.merge(spark, dir, src, Seq("id"))              // v3
    val table3 = SnapshotTable.readSnapshot(spark, dir)
      .where(col("id") === 20L).as[(Long, String, Long)].collect().head
    assert(table3 == ((20L, "g0", -1L))) // grp kept from base
    val f3 = SnapshotTable.readChangeFeed(spark, dir, 3, Some(3))
      .select("id", "grp", "n", "_change_type")
      .as[(Long, String, Long, String)].collect().toSet
    assert(f3 == Set((20L, "g0", 200L, "update_preimage"),
      (20L, "g0", -1L, "update_postimage"),
      (900L, "gZ", 5L, "insert")), s"got $f3")
    // replaying the feed onto v1 reproduces the committed table
    val feedAll = SnapshotTable.readChangeFeed(spark, dir, 2)
      .select("id", "grp", "n", "_change_type", "_commit_version")
      .as[(Long, String, Long, String, Long)].collect()
    val replay = (v1.as[(Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap ++ feedAll
      .filter(r => r._4 == "insert" || r._4 == "update_postimage")
      .map(r => r._1 -> ((r._1, r._2, r._3))).toMap).values.toSet
    assert(replay == SnapshotTable.readSnapshot(spark, dir)
      .as[(Long, String, Long)].collect().toSet)
  }

  test("CDF at the retention horizon: a version whose v-1 manifest was " +
    "vacuumed refuses (its delta is not derivable) instead of feeding " +
    "carried files as inserts; sidecar-recorded DML still feeds") {
    val dir = Files.createTempDirectory("snap-cdf-vac").toString
    SnapshotTable.enableChangeFeed(dir)
    val mk = (lo: Long, hi: Long) =>
      (lo until hi).map(i => (i, i * 2)).toDF("id", "n")
    SnapshotTable.commit(spark, mk(0L, 20L), dir)   // v1 append
    SnapshotTable.commit(spark, mk(20L, 40L), dir)  // v2 append
    SnapshotTable.delete(spark, dir, col("id") < 5L) // v3 delete (sidecar)
    SnapshotTable.commit(spark, mk(40L, 60L), dir)  // v4 append
    SnapshotTable.vacuum(dir, 3)                    // keeps v2..v4
    // v2 is an append whose v1 manifest is gone: diffing against an
    // empty base would duplicate v1's rows into the feed — refuse
    val err = intercept[IllegalStateException] {
      SnapshotTable.readChangeFeed(spark, dir, 2, Some(2)).collect()
    }
    assert(err.getMessage.contains("vacuumed"), err.getMessage)
    // v3's sidecar needs no v2 diff; v4 diffs against retained v3
    assert(SnapshotTable.readChangeFeed(spark, dir, 3, Some(3))
      .where(col("_change_type") === "delete").count() == 5L)
    assert(SnapshotTable.readChangeFeed(spark, dir, 4)
      .where(col("_change_type") === "insert").count() == 20L)
    // the streaming CDF path classifies through the SAME code and
    // refuses identically
    val err2 = intercept[Exception] {
      val q = spark.readStream.format("graft.sources.SnapshotSource")
        .option("readChangeFeed", "true").option("startingVersion", 2)
        .load(dir)
        .writeStream.format("memory").queryName("cdfvac")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      throw new IllegalStateException("stream should have failed")
    }
    assert(err2.getMessage.contains("vacuumed") ||
      Option(err2.getCause).exists(_.getMessage.contains("vacuumed")))
  }

  test("repairPartitionSpec: only the UNKNOWN-tuple files rewrite — " +
    "known files carry by identity, tuples re-derive exactly, content " +
    "never changes, the feed skips it, and metadata partition DELETE " +
    "works afterwards") {
    val dir = Files.createTempDirectory("snap-repair").toString
    val st = SnapshotTable
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, s"s${i % 3}", i * 2)).toDF("id", "src", "n")
    st.commit(spark, mk(0L, 120L), dir)                       // v1 flat
    st.commitPartitioned(spark, mk(120L, 240L), dir,
      Seq("src"), evolveSpec = true)                          // v2 evolved
    val v2files = st.manifestFiles(dir, 2)
    val v2vals = st.readPartValues(dir, 2).get
    val known = v2files.zip(v2vals).collect {
      case (f, t) if !t.exists(st.isUnknownPart) => f
    }
    assert(known.length < v2files.length) // some unknowns exist
    val before = st.readSnapshot(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    assert(st.repairPartitionSpec(spark, dir, numFiles = 2)
      .contains(3))
    // known files carried BY IDENTITY; zero unknowns remain
    val v3files = st.manifestFiles(dir, 3)
    assert(known.toSet.subsetOf(v3files.toSet))
    assert(st.readPartValues(dir, 3).get
      .forall(t => !t.exists(st.isUnknownPart)))
    assert(!st.partitionSummary(dir).exists(_._1.contains("__UNKNOWN__")))
    // content identical; rewrite-only (the feed skips it)
    assert(st.readSnapshot(spark, dir)
      .as[(Long, String, Long)].collect().toSet == before)
    assert(!st.isDataChange(dir, 3))
    // partition pruning is EXACT now (the repaired files no longer
    // survive every prune) and metadata DELETE can decide every file
    val kept = st.manifestFilesPruned(dir, 3, Map.empty,
      Map("src" -> Set(Option("s1"))))
    assert(kept.length < v3files.length)
    assert(st.readSnapshotPartitioned(spark, dir, Map("src" -> "s1"))
      .count() == (0L until 240L).count(_ % 3 == 1))
    st.deletePartitions(dir, Map("src" -> "s0")) // refused pre-repair
    assert(st.readSnapshot(spark, dir)
      .where(col("src") === "s0").count() == 0L)
    // idempotent: nothing left to repair
    assert(st.repairPartitionSpec(spark, dir).isEmpty)
  }

  test("SEGMENTED manifests: appends write O(delta) metadata (one new " +
    "segment + a tiny list), every reader is storage-agnostic, DML " +
    "folds back to a full manifest, the chain caps at 64, and vacuum " +
    "reaps dead segments") {
    val dir = Files.createTempDirectory("snap-seg").toString
    val st = SnapshotTable
    val mk = (lo: Long, hi: Long) =>
      (lo until hi).map(i => (i, s"g${i % 4}", i * 2)).toDF("id", "grp", "n")
    st.commitMultiStats(spark, mk(0L, 100L), dir, statsCols = Seq("id", "n"))
    assert(st.readSegments(dir, 1).isEmpty) // v1: full manifest
    st.commitMultiStats(spark, mk(100L, 200L), dir,
      statsCols = Seq("id", "n"))
    st.commitMultiStats(spark, mk(200L, 300L), dir,
      statsCols = Seq("id", "n"))
    // v2 onward: segmented — prev materialized once, one new segment
    // per append
    assert(st.readSegments(dir, 2).length == 2)
    assert(st.readSegments(dir, 3).length == 3)
    // every reader answers identically through the assembled view
    assert(st.readSnapshot(spark, dir).count() == 300L)
    assert(st.readSnapshot(spark, dir, Some(2)).count() == 200L)
    assert(st.manifestCount(dir, 3).contains(300L))
    assert(st.readAllStats(dir, 3).map(_._1) == Seq("id", "n"))
    assert(st.readAllStats(dir, 3).head._2.length ==
      st.manifestFiles(dir, 3).length)
    assert(st.manifestMinMaxAll(dir, 3)("id") == ((0L, 299L)))
    assert(st.readSnapshotPruned(spark, dir, "id", 150L, 160L)
      .count() == 11L)
    assert(st.readSizes(dir, 3).exists(_.forall(_ > 0L)))
    assert(st.readSchema(dir, 3).nonEmpty)
    // O(delta) witness: the list file's byte growth per append is
    // segment-name-sized, independent of table file count — while the
    // ASSEMBLED metadata keeps growing with the table
    val l2 = new java.io.File(dir, "_log/v00002.json").length()
    val l3 = new java.io.File(dir, "_log/v00003.json").length()
    assert(l3 - l2 < 64, s"list grew ${l3 - l2} bytes per append")
    // DSv2 reads plan from the assembled view (count via pushdown)
    assert(spark.read.format("graft.sources.SnapshotSource").load(dir)
      .groupBy().count().as[Long].head() == 300L)
    // CoW DML on a segmented base folds to a full manifest and stays
    // exact (publish carries per-file metadata through assembly)
    st.delete(spark, dir, col("id") === 42L)
    assert(st.readSegments(dir, 4).isEmpty)
    assert(st.readSnapshot(spark, dir).count() == 299L)
    assert(st.readAllStats(dir, 4).head._2.length ==
      st.manifestFiles(dir, 4).length)
    // hive-partitioned appends segment too, tuples carried exactly
    val pd = Files.createTempDirectory("snap-segp").toString
    st.commitPartitioned(spark, mk(0L, 60L), pd, Seq("grp"))
    st.commitPartitioned(spark, mk(60L, 120L), pd, Seq("grp"))
    assert(st.readSegments(pd, 2).length == 2)
    assert(st.readSnapshotPartitioned(spark, pd, Map("grp" -> "g1"))
      .count() == 30L)
    assert(st.readPartValues(pd, 2).get.length ==
      st.manifestFiles(pd, 2).length)
    // the 64-segment cap: metadata-only appends via pre-staged files;
    // the 64th+ append folds to a full manifest, then the chain restarts
    val cd = Files.createTempDirectory("snap-segcap").toString
    val staged = (0 until 70).map { i =>
      Seq((i.toLong, i.toLong)).toDF("a", "b").coalesce(1)
        .write.parquet(s"$cd/data/b$i")
      val f = new java.io.File(s"$cd/data/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getName
      s"data/b$i/$f"
    }
    val bulkSchema = spark.read.parquet(s"$cd/data/b0").schema
    staged.foreach { f =>
      SnapshotTable.commitStagedFiles(cd, Seq(f), bulkSchema)
    }
    val vs = st.versions(cd)
    assert(vs.length == 70)
    val segLens = vs.map(v => st.readSegments(cd, v).length)
    assert(segLens.max <= 64, s"chain exceeded cap: ${segLens.max}")
    assert(segLens.drop(1).contains(0), "no fold-to-full ever happened")
    assert(st.readSnapshot(spark, cd).count() == 70L)
    assert(st.manifestCount(cd, 70).contains(70L))
    // vacuum: segments referenced by retained versions survive, the
    // rest die; the retained table reads exactly
    st.vacuum(cd, 3)
    assert(st.readSnapshot(spark, cd).count() == 70L)
    val segFiles = new java.io.File(cd, "_log").listFiles()
      .map(_.getName).filter(_.startsWith("seg-")).toSet
    val referenced = st.versions(cd)
      .flatMap(v => st.readSegments(cd, v)).toSet
    assert(referenced.subsetOf(segFiles))
    assert((segFiles -- referenced).isEmpty,
      s"dead segments survived vacuum: ${segFiles -- referenced}")
  }

  test("MERGE-ON-READ DML: delete tombstones by position with ZERO " +
    "data files rewritten, update/merge append only changed rows, " +
    "every read path applies deletes, metadata count stays exact, " +
    "compaction folds, vacuum reaps dead sidecars, CDF records") {
    val dir = Files.createTempDirectory("snap-mor").toString
    val st = SnapshotTable
    st.enableChangeFeed(dir)
    st.enableMergeOnRead(dir)
    val v1 = (0L until 100L).map(i => (i, s"g${i % 4}", i * 2))
      .toDF("id", "grp", "n")
    st.commitMultiStats(spark, v1, dir, statsCols = Seq("id"))    // v1
    val f1 = st.manifestFiles(dir, 1)
    // v2: MoR DELETE — the file list is UNCHANGED (the whole point)
    st.delete(spark, dir, col("id") < 10L)
    assert(st.manifestFiles(dir, 2) == f1)
    assert(st.readDeletes(dir, 2).nonEmpty && st.readNdel(dir, 2) == 10L)
    assert(st.readSnapshot(spark, dir).count() == 90L)
    assert(st.readSnapshot(spark, dir).agg(min(col("id")))
      .head().getLong(0) == 10L)
    // time travel: v1 still reads pre-delete
    assert(st.readSnapshot(spark, dir, Some(1)).count() == 100L)
    // metadata count subtracts tombstones; min/max declines while dirty
    assert(st.manifestCount(dir, 2).contains(90L))
    assert(st.manifestMinMaxAll(dir, 2).isEmpty)
    // pruned read paths apply deletes too
    assert(st.readSnapshotPruned(spark, dir, "id", 0L, 9L).count() == 0L)
    assert(st.readSnapshotPruned(spark, dir, "id", 5L, 15L).count() == 6L)
    // v3: MoR UPDATE — appends only the rebuilt row, carries all files
    st.update(spark, dir, col("id") === 50L, Map("n" -> lit(999L)))
    assert(f1.toSet.subsetOf(st.manifestFiles(dir, 3).toSet))
    assert(st.readSnapshot(spark, dir).count() == 90L)
    assert(st.readSnapshot(spark, dir).where(col("id") === 50L)
      .select("n").as[Long].collect().toSeq == Seq(999L))
    // v4: MoR MERGE — matched key updated in place, new key appended
    val src = Seq((20L, "gX", -1L), (500L, "gN", 1L))
      .toDF("id", "grp", "n")
    st.merge(spark, dir, src, Seq("id"))
    val t4 = st.readSnapshot(spark, dir)
    assert(t4.count() == 91L)
    assert(t4.where(col("id") === 20L).as[(Long, String, Long)]
      .collect().toSeq == Seq((20L, "gX", -1L)))
    assert(t4.where(col("id") === 500L).count() == 1L)
    assert(st.readNdel(dir, 4) == 12L) // 10 deleted + id=50 + id=20
    // v5: re-deleting already-tombstoned rows matches NOTHING (scans
    // see logical rows) — a metadata no-op commit
    st.delete(spark, dir, col("id") < 10L)
    assert(st.readNdel(dir, 5) == 12L)
    assert(st.readSnapshot(spark, dir).count() == 91L)
    // CDF recorded every leg; replaying it reproduces the table
    val feed = st.readChangeFeed(spark, dir, 1)
      .select("id", "grp", "n", "_change_type", "_commit_version")
      .as[(Long, String, Long, String, Long)].collect()
    assert(feed.count(r => r._5 == 2L && r._4 == "delete") == 10)
    assert(feed.filter(_._5 == 3L).map(r => (r._4, r._3)).toSet ==
      Set(("update_preimage", 100L), ("update_postimage", 999L)))
    assert(feed.filter(r => r._5 == 4L && r._4 == "insert")
      .map(_._1).toSeq == Seq(500L))
    val replayed = feed.sortBy(_._5)
      .foldLeft(Map.empty[Long, (Long, String, Long)]) {
        case (m, (id, g, n, ct, _)) => ct match {
          case "insert" | "update_postimage" => m + (id -> ((id, g, n)))
          case "delete" => m - id
          case _ => m
        }
      }.values.toSet
    assert(replayed == t4.as[(Long, String, Long)].collect().toSet)
    // v6: compaction FOLDS the deletes — clean manifest, identical
    // content, metadata min/max answers restored
    val before = t4.as[(Long, String, Long)].collect().toSet
    st.compact(spark, dir, numFiles = 2)
    val v6 = st.versions(dir).last
    assert(st.readDeletes(dir, v6).isEmpty && st.readDirty(dir, v6).isEmpty)
    assert(st.readNdel(dir, v6) == 0L)
    assert(st.readSnapshot(spark, dir).as[(Long, String, Long)]
      .collect().toSet == before)
    assert(st.manifestMinMaxAll(dir, v6).nonEmpty)
    // vacuum to the compacted version reaps the dead sidecars
    st.vacuum(dir, 1)
    val delDir = new java.io.File(dir, "deletes")
    def walkParquet(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles())
        .getOrElse(Array.empty[java.io.File]).toSeq
      kids.flatMap(k => if (k.isDirectory) walkParquet(k)
        else if (k.getName.endsWith(".parquet")) Seq(k) else Nil)
    }
    assert(walkParquet(delDir).isEmpty)
  }

  test("MERGE-ON-READ on a PARTITIONED table: tombstones respect the " +
    "layout, partition-pruned reads apply them, and a CoW rewrite " +
    "through compactPartition folds only that partition's deletes") {
    val dir = Files.createTempDirectory("snap-morp").toString
    val st = SnapshotTable
    st.enableMergeOnRead(dir)
    val data = (0L until 120L).map(i => (i, s"s${i % 3}", i * 2))
      .toDF("id", "src", "n")
    st.commitPartitioned(spark, data, dir, Seq("src"))
    st.delete(spark, dir, col("id") % 10 === 0L) // 12 tombstones across parts
    assert(st.readSnapshot(spark, dir).count() == 108L)
    assert(st.readSnapshotPartitioned(spark, dir, Map("src" -> "s0"))
      .count() == 40L - 4L) // ids ≡ 0 mod 30 removed from s0's 40
    // update moves a row ACROSS partition values: tombstone in s1,
    // appended file lands value-pure under s2
    st.update(spark, dir, col("id") === 1L, Map("src" -> lit("s2")))
    assert(st.readSnapshotPartitioned(spark, dir, Map("src" -> "s2"))
      .where(col("id") === 1L).count() == 1L)
    assert(st.readSnapshotPartitioned(spark, dir, Map("src" -> "s1"))
      .where(col("id") === 1L).count() == 0L)
    // compacting ONE partition folds exactly its tombstones; others stay
    val vBefore = st.versions(dir).last
    val dirtyBefore = st.readDirty(dir, vBefore).toSet
    st.compactPartition(spark, dir, Map("src" -> "s0"))
    val vAfter = st.versions(dir).last
    val dirtyAfter = st.readDirty(dir, vAfter).toSet
    assert(dirtyAfter.nonEmpty && dirtyAfter.subsetOf(dirtyBefore))
    assert(st.readSnapshot(spark, dir).count() == 108L)
    assert(st.readSnapshotPartitioned(spark, dir, Map("src" -> "s0"))
      .count() == 36L)
    // metadata partition delete still works and drops a CLEAN slice;
    // dropping a dirty partition would refuse the feed edge, so drop
    // after compacting it clean
    st.compactPartition(spark, dir, Map("src" -> "s1"))
    st.deletePartitions(dir, Map("src" -> "s1"))
    assert(st.readSnapshot(spark, dir)
      .where(col("src") === "s1").count() == 0L)
  }

  test("a DATA value equal to the reserved spec-evolution marker " +
    "(u0002) in a partition column refuses at commit — it would be " +
    "indistinguishable from a genuine UNKNOWN tuple") {
    val dir = Files.createTempDirectory("snap-inband").toString
    val bad = Seq((1L, ""), (2L, "ok")).toDF("id", "src")
    val err = intercept[Exception] {
      SnapshotTable.commitPartitioned(spark, bad, dir, Seq("src"))
    }
    assert(err.getMessage.contains("spec-evolution marker"),
      err.getMessage)
    // ...and genuine evolution UNKNOWNs still commit fine afterwards
    val ok = Seq((1L, "a"), (2L, "b")).toDF("id", "src")
    SnapshotTable.commit(spark, ok, dir)
    SnapshotTable.commitPartitioned(spark, Seq((3L, "c")).toDF("id", "src"),
      dir, Seq("src"), evolveSpec = true)
    assert(SnapshotTable.readSnapshot(spark, dir).count() == 3L)
  }

  test("PARTITION-SPEC EVOLUTION: a later commit declares a NEW spec; " +
    "old files keep UNKNOWN tuples (never pruned, never wrong), new " +
    "files prune exactly, metadata delete refuses toward CoW, and a " +
    "rewrite repairs the unknowns") {
    val dir = Files.createTempDirectory("snap-evo").toString
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, s"s${i % 3}", i * 2)).toDF("id", "src", "n")
    // v1: unpartitioned history
    SnapshotTable.commit(spark, mk(0L, 120L), dir)
    // a plain append with a different spec still refuses...
    val refuse = intercept[IllegalArgumentException] {
      SnapshotTable.commitPartitioned(spark, mk(120L, 121L), dir,
        Seq("src"))
    }
    assert(refuse.getMessage.contains("evolveSpec"))
    // ...but declared evolution is accepted: v2 partitions NEW data
    SnapshotTable.commitPartitioned(spark, mk(120L, 240L), dir,
      Seq("src"), evolveSpec = true)
    assert(SnapshotTable.partitionColumns(dir, 2) == Seq("src"))
    // full read across the spec boundary
    assert(SnapshotTable.readSnapshot(spark, dir).count() == 240L)
    // exact partitioned read: old files scanned + residual-filtered
    assert(SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("src" -> "s1")).count() == (0L until 240L).count(_ % 3 == 1))
    // pruning keeps EVERY pre-evolution file (unknown = may-contain)
    // and still drops the new files of other values
    val v1files = SnapshotTable.manifestFiles(dir, 1).toSet
    val all = SnapshotTable.manifestFiles(dir, 2)
    val kept = SnapshotTable.manifestFilesPruned(dir, 2, Map.empty,
      Map("src" -> Set(Option("s1"))))
    assert(v1files.subsetOf(kept.toSet))
    assert(kept.length < all.length)
    // the inventory names the pre-evolution slice
    assert(SnapshotTable.partitionSummary(dir).exists(
      _._1.contains("__UNKNOWN__")))
    // DSv2 route: pruned read stays exact over the mixed manifest
    val ds = spark.read.format("graft.sources.SnapshotSource").load(dir)
    assert(ds.where(col("src") === "s2").count() ==
      (0L until 240L).count(_ % 3 == 2))
    // metadata partition delete cannot decide pre-evolution files
    val und = intercept[IllegalArgumentException] {
      SnapshotTable.deletePartitions(dir, Map("src" -> "s0"))
    }
    assert(und.getMessage.contains("cannot decide"))
    // SQL DELETE falls back to copy-on-write and answers exactly
    spark.conf.set("spark.sql.catalog.gevo_cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gevo_cat.root",
      new java.io.File(dir).getParent)
    val name = new java.io.File(dir).getName
    spark.sql(s"DELETE FROM gevo_cat.`$name` WHERE src = 's0'")
    assert(SnapshotTable.readSnapshot(spark, dir).count() ==
      (0L until 240L).count(_ % 3 != 0))
    // the rewrite repaired every touched file's tuple: v1 files all
    // held s0 rows, so every unknown is gone and pruning is exact again
    val vN = SnapshotTable.versions(dir).last
    assert(SnapshotTable.readPartValues(dir, vN).get
      .forall(!_.exists(SnapshotTable.isUnknownPart)))
    // v1 stays time-travelable with its own (spec-free) manifest
    assert(SnapshotTable.readSnapshot(spark, dir, Some(1)).count() == 120L)
    assert(SnapshotTable.partitionColumns(dir, 1).isEmpty)
  }

  test("MERGE-ON-READ with escaped partition values (space, %, =, #): " +
    "the UriPath row-identity bridge resolves scan URIs to manifest " +
    "paths exactly — tombstones land in the right files, reads apply " +
    "them, updates move rows across escaped values, compaction folds") {
    val dir = Files.createTempDirectory("snap-moresc").toString
    val st = SnapshotTable
    st.enableMergeOnRead(dir)
    val vals = Seq("a b", "p%q", "x=y", "h#1")
    val df = (0L until 200L).map(i =>
      (i, vals((i % 4).toInt), i * 3)).toDF("id", "source", "n")
    st.commitPartitioned(spark, df, dir, Seq("source"))
    // tombstone rows inside an escaped partition (a rel-path
    // derivation mismatch would fail the commit loudly at the
    // manifest-membership validation, never silently misfile)
    st.delete(spark, dir, col("source") === "a b" && col("id") < 40L)
    assert(st.readSnapshot(spark, dir).count() == 190L) // 10 of a-b gone
    assert(st.readSnapshotPartitioned(spark, dir, Map("source" -> "a b"))
      .count() == 40L)
    // update MOVES a row into an escaped value: tombstone in p%q,
    // append lands value-pure under x=y
    st.update(spark, dir, col("id") === 1L, Map("source" -> lit("x=y")))
    assert(st.readSnapshotPartitioned(spark, dir, Map("source" -> "x=y"))
      .where(col("id") === 1L).count() == 1L)
    assert(st.readSnapshotPartitioned(spark, dir, Map("source" -> "p%q"))
      .where(col("id") === 1L).count() == 0L)
    // DSv2 read applies the tombstones through the same bridge
    assert(spark.read.format("graft.sources.SnapshotSource").load(dir)
      .count() == 190L)
    // compaction folds everything clean
    val before = st.readSnapshot(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    st.compact(spark, dir, numFiles = 2)
    val vC = st.versions(dir).last
    assert(st.readDirty(dir, vC).isEmpty)
    assert(st.readSnapshot(spark, dir).as[(Long, String, Long)]
      .collect().toSet == before)
  }

  test("partition values needing path escaping (space, %, =, #): " +
    "commit, pruned reads, DML touch resolution, and metadata delete " +
    "all survive the URL-encoding skew between scan and disk") {
    val dir = Files.createTempDirectory("snap-esc").toString
    val vals = Seq("a b", "p%q", "x=y", "h#1")
    val df = (0L until 200L).map(i =>
      (i, vals((i % 4).toInt), i * 3)).toDF("id", "source", "n")
    SnapshotTable.commitPartitioned(spark, df, dir, Seq("source"),
      statsCols = Seq("id"))
    // recorded tuples are the RAW values, not escaped path fragments
    assert(SnapshotTable.readPartValues(dir, 1).get
      .flatten.flatten.toSet == vals.toSet)
    // exact prune + read of an escaping-needing partition
    assert(SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("source" -> "a b")).count() == 50L)
    // CoW DML resolves touched files inside escaped partition dirs —
    // pre-fix this silently no-opped (touched resolved as untouched)
    SnapshotTable.delete(spark, dir, col("id") < 8L) // 2 rows per value
    assert(SnapshotTable.readSnapshot(spark, dir).count() == 192L)
    assert(SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("source" -> "p%q")).count() == 48L)
    // UPDATE moving a row INTO an escaped partition files it truthfully
    SnapshotTable.update(spark, dir, col("id") === 101L,
      Map("source" -> lit("a b")))
    assert(SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("source" -> "a b")).where(col("id") === 101L).count() == 1L)
    assert(SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("source" -> "a b")).count() == 49L)
    // metadata-only delete addresses escaped values by RAW value
    SnapshotTable.deletePartitions(dir, Map("source" -> "x=y"))
    assert(SnapshotTable.readSnapshot(spark, dir)
      .where(col("source") === "x=y").count() == 0L)
    assert(SnapshotTable.readSnapshot(spark, dir).count() == 192L + 1L -
      1L - 48L) // 192 after delete, ±1 moved row net zero, minus x=y's 48
  }

  test("deletePartitions is METADATA-ONLY: whole partitions drop with " +
    "zero data IO, stats/rows/sizes/values carry, refusals are loud") {
    val dir = Files.createTempDirectory("snap-pdel").toString
    val df = (0L until 300L).map(i =>
      (i, if (i % 5 == 4) null else s"g${i % 4}", i * 2))
      .toDF("id", "grp", "n")
    SnapshotTable.commitPartitioned(spark, df, dir, Seq("grp"),
      statsCols = Seq("id"))
    val before = SnapshotTable.manifestFiles(dir, 1)
    def diskFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        Option(f.listFiles()).getOrElse(Array.empty).flatMap(k =>
          if (k.isDirectory) walk(k)
          else if (k.getName.endsWith(".parquet")) Seq(k.getPath)
          else Seq.empty).toSeq
      walk(new java.io.File(dir, "data")).toSet
    }
    val diskBefore = diskFiles()
    val v2 = SnapshotTable.deletePartitions(dir, Map("grp" -> "g1"))
    // METADATA-ONLY: no data file written or removed, manifest shrinks
    assert(diskFiles() == diskBefore)
    val after = SnapshotTable.manifestFiles(dir, v2)
    assert(after.toSet.subsetOf(before.toSet) && after.length < before.length)
    // content = the row-level delete's answer
    assert(SnapshotTable.readSnapshot(spark, dir)
      .as[(Long, String, Long)].collect().toSet ==
      df.where(col("grp").isNull || col("grp") =!= "g1")
        .as[(Long, String, Long)].collect().toSet)
    // carried metadata stays aligned and usable
    assert(SnapshotTable.readAllStats(dir, v2).forall(
      _._2.length == after.length))
    assert(SnapshotTable.readPartValues(dir, v2).get.length == after.length)
    assert(SnapshotTable.manifestCount(dir, v2).contains(
      df.where(col("grp").isNull || col("grp") =!= "g1").count()))
    // NULL partition drops by null key; time travel keeps v1 whole
    val v3 = SnapshotTable.deletePartitions(dir, Map("grp" -> null))
    assert(SnapshotTable.readSnapshot(spark, dir)
      .where(col("grp").isNull).count() == 0L)
    assert(SnapshotTable.readSnapshot(spark, dir, Some(1)).count() == 300L)
    // match-nothing = metadata no-op commit
    val v4 = SnapshotTable.deletePartitions(dir, Map("grp" -> "nope"))
    assert(SnapshotTable.manifestFiles(dir, v4) ==
      SnapshotTable.manifestFiles(dir, v3))
    // refusals: unknown column; emptying the table
    intercept[IllegalArgumentException](
      SnapshotTable.deletePartitions(dir, Map("id" -> 1L)))
    val empty = intercept[IllegalArgumentException] {
      Seq("g0", "g2", "g3").foldLeft(0)((_, g) =>
        SnapshotTable.deletePartitions(dir, Map("grp" -> g)))
    }
    assert(empty.getMessage.contains("would empty"))
  }

  test("MERGE prunes touched-file discovery by key-column stats: files " +
    "outside the source key envelope carry by reference") {
    val dir = Files.createTempDirectory("snap-mprune").toString
    // 20 range-clustered files: ABOVE the >=16-file engage threshold,
    // so the envelope prune actually runs
    SnapshotTable.commitWithStats(spark,
      (0L until 400L).map(i => (i, s"a$i")).toDF("id", "s")
        .repartitionByRange(20, col("id")),
      dir, statsCol = Some("id"))
    val files1 = SnapshotTable.manifestFiles(dir, 1)
    assert(files1.length >= 16)
    // a narrow-range delta: keys 100..119 + one brand-new key
    val delta = ((100L until 120L).map(i => (i, s"UP$i")) :+
      ((1000L, "NEW"))).toDF("id", "s")
    SnapshotTable.merge(spark, dir, delta, Seq("id"))
    val files2 = SnapshotTable.manifestFiles(dir, 2)
    val carried = files2.toSet.intersect(files1.toSet)
    // the 20-wide band + key 1000 touch ~2-3 of 20 files; the rest
    // MUST carry by reference (file identity)
    assert(carried.size >= files1.length - 4,
      s"only ${carried.size} of ${files1.size} carried")
    // content exact: matched keys updated, the new key inserted
    val got = SnapshotTable.readSnapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got.size == 401)
    assert(got(110L) == "UP110" && got(1000L) == "NEW" &&
      got(50L) == "a50")
    // an all-NULL-envelope / no-stats table still merges (no pruning)
    val dir2 = Files.createTempDirectory("snap-mprune2").toString
    SnapshotTable.commit(spark,
      (0L until 50L).map(i => (i, s"a$i")).toDF("id", "s"), dir2)
    SnapshotTable.merge(spark, dir2,
      Seq((7L, "X")).toDF("id", "s"), Seq("id"))
    assert(SnapshotTable.readSnapshot(spark, dir2)
      .as[(Long, String)].collect().toMap.apply(7L) == "X")
  }

  test("compactPartition: one partition's small files collapse, every " +
    "other file carried byte-identical, content never changes") {
    val dir = Files.createTempDirectory("snap-pcompact").toString
    // streaming-ingest shape: several partitioned appends = small
    // files accumulating per partition value
    (0 until 4).foreach { b =>
      SnapshotTable.commitPartitioned(spark,
        (b * 60L until (b + 1) * 60L).map(i => (i, s"g${i % 3}", i * 2))
          .toDF("id", "grp", "n"), dir, Seq("grp"))
    }
    val v0 = SnapshotTable.versions(dir).last
    def filesOf(v: Int, g: String): Seq[String] = {
      val fs = SnapshotTable.manifestFiles(dir, v)
      val pv = SnapshotTable.readPartValues(dir, v).get
      fs.zip(pv).collect { case (f, Seq(Some(`g`))) => f }
    }
    assert(filesOf(v0, "g1").length >= 4) // one per append
    val others0 = SnapshotTable.manifestFiles(dir, v0)
      .filterNot(filesOf(v0, "g1").toSet)
    val before = SnapshotTable.readSnapshot(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    val v1 = SnapshotTable.compactPartition(spark, dir,
      Map("grp" -> "g1"), numFiles = 1)
    // g1 collapsed to one file; every other file carried BY REFERENCE
    assert(filesOf(v1, "g1").length == 1)
    assert(SnapshotTable.manifestFiles(dir, v1)
      .filterNot(filesOf(v1, "g1").toSet).toSet == others0.toSet)
    // content identical; pruning still exact; metadata carried
    assert(SnapshotTable.readSnapshot(spark, dir)
      .as[(Long, String, Long)].collect().toSet == before)
    assert(SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("grp" -> "g1")).count() == (0L until 240L).count(_ % 3 == 1))
    assert(SnapshotTable.manifestCount(dir, v1).contains(240L))
    // unknown partition column / empty partition refuse loudly
    intercept[IllegalArgumentException](
      SnapshotTable.compactPartition(spark, dir, Map("id" -> 1L)))
    intercept[IllegalArgumentException](
      SnapshotTable.compactPartition(spark, dir, Map("grp" -> "nope")))
  }

  test("two-column partitioning: tuple purity, compound exact pruning, " +
    "partition delete on one or both columns") {
    val dir = Files.createTempDirectory("snap-part2").toString
    val df = (0L until 240L).map(i =>
      (i, s"s${i % 3}", (i % 2).toInt, i * 2)).toDF("id", "src", "b", "n")
    SnapshotTable.commitPartitioned(spark, df, dir, Seq("src", "b"))
    assert(SnapshotTable.partitionColumns(dir, 1) == Seq("src", "b"))
    val got = SnapshotTable.readSnapshotPartitioned(spark, dir,
      Map("src" -> "s1", "b" -> 0)).as[(Long, String, Int, Long)]
      .collect().toSet
    assert(got == df.where(col("src") === "s1" && col("b") === 0)
      .as[(Long, String, Int, Long)].collect().toSet)
    // pruning on ONE of the two columns keeps all its b-values
    val oneCol = SnapshotTable.manifestFilesPruned(dir, 1, Map.empty,
      Map("src" -> Set(Option("s2"))))
    assert(oneCol.nonEmpty &&
      oneCol.length < SnapshotTable.manifestFiles(dir, 1).length)
    // metadata delete of one (src, b) cell
    SnapshotTable.deletePartitions(dir, Map("src" -> "s0", "b" -> 1))
    assert(SnapshotTable.readSnapshot(spark, dir)
      .where(col("src") === "s0" && col("b") === 1).count() == 0L)
    assert(SnapshotTable.readSnapshot(spark, dir)
      .where(col("src") === "s0" && col("b") === 0).count() ==
      df.where(col("src") === "s0" && col("b") === 0).count())
  }

  test("multi-column manifest stats: two-predicate pruning compounds, " +
    "appends/DML/restore carry every column, compact preserves the " +
    "tracked set, results never change") {
    val dir = Files.createTempDirectory("snap-mstats").toString
    // b = a * 10: range-clustering on a also clusters b, so BOTH
    // columns prune determinably
    val df = (0L until 400L).map(i => (i, i * 10, s"r$i")).toDF("a", "b", "s")
    SnapshotTable.commitMultiStats(spark,
      df.repartitionByRange(8, col("a")), dir, statsCols = Seq("a", "b"))
    assert(SnapshotTable.statsColumns(dir, 1) == Seq("a", "b"))
    val all = SnapshotTable.manifestFiles(dir, 1)
    // single-column bound prunes...
    val onA = SnapshotTable.manifestFilesPruned(dir, 1,
      Map("a" -> ((0L, 49L))))
    assert(onA.nonEmpty && onA.length < all.length)
    // ...and a second column's bound compounds (disjoint b-range)
    val both = SnapshotTable.manifestFilesPruned(dir, 1,
      Map("a" -> ((0L, 399L)), "b" -> ((3900L, 3990L))))
    assert(both.nonEmpty && both.length < all.length)
    // contradictory bounds prune everything
    assert(SnapshotTable.manifestFilesPruned(dir, 1,
      Map("a" -> ((0L, 49L)), "b" -> ((3900L, 3990L)))).isEmpty)
    // pruned read = unpruned read (may-contain, never row-filtering)
    val want = df.where(col("a") <= 120L && col("b") >= 500L)
      .as[(Long, Long, String)].collect().toSet
    val got = SnapshotTable.readSnapshotPrunedMulti(spark, dir,
        Map("a" -> ((0L, 120L)), "b" -> ((500L, Long.MaxValue))))
      .as[(Long, Long, String)].collect().toSet
    assert(got == want)
    // append (multi-stats) carries both columns
    SnapshotTable.commitMultiStats(spark,
      (400L until 450L).map(i => (i, i * 10, s"r$i")).toDF("a", "b", "s"),
      dir, statsCols = Seq("a", "b"))
    assert(SnapshotTable.statsColumns(dir, 2) == Seq("a", "b"))
    assert(SnapshotTable.readAllStats(dir, 2).forall(
      _._2.length == SnapshotTable.manifestFiles(dir, 2).length))
    // append covering only one base column refuses loudly
    val half = intercept[IllegalArgumentException] {
      SnapshotTable.commitMultiStats(spark,
        (450L until 460L).map(i => (i, i * 10, s"r$i")).toDF("a", "b", "s"),
        dir, statsCols = Seq("a"))
    }
    assert(half.getMessage.contains("cover every"))
    // DML recomputes every column for rewritten files only
    SnapshotTable.delete(spark, dir, col("a") < 10L)
    assert(SnapshotTable.statsColumns(dir, 3) == Seq("a", "b"))
    // post-DML pruning on b: the surviving band [100, 190] is present,
    // and the deleted band [0, 89] (= a < 9) prunes to nothing because
    // the rewrite re-tightened the touched file's recorded b-range
    assert(SnapshotTable.manifestFilesPruned(dir, 3,
      Map("b" -> ((100L, 190L)))).nonEmpty)
    assert(SnapshotTable.manifestFilesPruned(dir, 3,
      Map("b" -> ((0L, 89L)))).isEmpty)
    // compact preserves the tracked set (clusters on the primary)
    SnapshotTable.compact(spark, dir, numFiles = 3)
    assert(SnapshotTable.statsColumns(dir, 4) == Seq("a", "b"))
    assert(SnapshotTable.readSnapshot(spark, dir).count() == 440L)
    // restore carries the whole stats map
    SnapshotTable.restore(dir, 2)
    assert(SnapshotTable.statsColumns(dir, 5) == Seq("a", "b"))
    assert(SnapshotTable.readSnapshot(spark, dir).count() == 450L)
  }

  test("manifests record per-file byte sizes: appends/DML/restore " +
    "carry them, every recorded size matches the file on disk, " +
    "pre-upgrade logs answer None") {
    val dir = Files.createTempDirectory("snap-sizes").toString
    SnapshotTable.commit(spark,
      (0L until 10L).map(i => (i, s"a$i")).toDF("id", "s"), dir)
    SnapshotTable.commit(spark,
      (10L until 15L).map(i => (i, s"a$i")).toDF("id", "s"), dir)
    def sizesMatchDisk(v: Int): Unit = {
      val files = SnapshotTable.manifestFiles(dir, v)
      val sizes = SnapshotTable.readSizes(dir, v)
      assert(sizes.isDefined && sizes.get.length == files.length,
        s"v$v sizes missing or misaligned")
      files.zip(sizes.get).foreach { case (f, len) =>
        assert(new java.io.File(s"$dir/$f").length() == len,
          s"v$v: recorded $len != disk for $f")
      }
    }
    sizesMatchDisk(1); sizesMatchDisk(2)
    // CoW delete: untouched files carry sizes, rewritten files re-stat
    SnapshotTable.delete(spark, dir, col("id") < 3L)
    sizesMatchDisk(3)
    // merge and restore carry without touching data
    SnapshotTable.merge(spark, dir,
      Seq((100L, "new")).toDF("id", "s"), Seq("id"))
    sizesMatchDisk(4)
    SnapshotTable.restore(dir, 2)
    sizesMatchDisk(5)
    // a pre-upgrade manifest answers None
    // strip the field wherever it lives — the manifest list AND the
    // segment files a segmented append moved the per-file arrays into
    (new java.io.File(dir, "_log").listFiles().toSeq :+
        new java.io.File(dir, "_log/v00002.json")).distinct
      .filter(f => f.getName == "v00002.json" ||
        f.getName.startsWith("seg-"))
      .foreach { f =>
        val j = new String(Files.readAllBytes(f.toPath))
        Files.write(f.toPath,
          j.replaceAll(""","sizes":\[[^\]]*\]""", "").getBytes)
      }
    assert(SnapshotTable.readSizes(dir, 2).isEmpty)
  }

  test("restore publishes a metadata-only commit with the target's " +
    "content, keeps the bad version in history, carries stats, and " +
    "refuses unknown or vacuumed versions") {
    val dir = Files.createTempDirectory("snap-restore").toString
    SnapshotTable.commitWithStats(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir,
      statsCol = Some("id"))
    SnapshotTable.commitWithStats(spark,
      Seq((3L, "c")).toDF("id", "s"), dir, statsCol = Some("id"))
    SnapshotTable.commitWithStats(spark,
      Seq((9L, "z")).toDF("id", "s"), dir, overwrite = true,
      statsCol = Some("id")) // the bad write
    val nFilesBefore = Option(new java.io.File(dir, "data")
      .listFiles()).map(_.length).getOrElse(0)
    val v4 = SnapshotTable.restore(dir, 2)
    assert(v4 == 4)
    // metadata-only: no new data directory appeared
    assert(Option(new java.io.File(dir, "data").listFiles())
      .map(_.length).getOrElse(0) == nFilesBefore)
    assert(contents(dir, None) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(contents(dir, Some(3)) == Set((9L, "z"))) // history intact
    // the restored manifest carried v2's stats: a pruned range read
    // still plans and answers exactly
    assert(SnapshotTable.readSnapshotPruned(spark, dir, "id", 3L, 3L)
      .as[(Long, String)].collect().toSet == Set((3L, "c")))
    // appends continue from the restored content
    SnapshotTable.commit(spark, Seq((10L, "y")).toDF("id", "s"), dir)
    assert(contents(dir, None) ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (10L, "y")))
    intercept[IllegalArgumentException](SnapshotTable.restore(dir, 99))
    // vacuum away v1..v3, then restoring to a dropped version refuses
    SnapshotTable.vacuum(dir, keep = 2)
    val gone = intercept[IllegalArgumentException](
      SnapshotTable.restore(dir, 2))
    assert(gone.getMessage.contains("vacuumed or never committed"))
    // but restoring to a RETAINED version still works after the vacuum
    assert(SnapshotTable.restore(dir, 4) == 6)
    assert(contents(dir, None) == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("legacy 'append@epoch<e>' manifest actions still count in the " +
    "exactly-once ledger (a pre-upgrade table must not read as empty)") {
    val dir = Files.createTempDirectory("snap-legacytxn").toString
    SnapshotTable.commit(spark, Seq((1L, "a")).toDF("id", "s"), dir)
    // hand-write a v2 manifest in the PRE-(queryId,epoch) action format
    SnapshotTable.writeManifest(dir, 2, "append@epoch0",
      SnapshotTable.readManifest(dir, 1))
    assert(SnapshotTable.committedTxns(dir) ==
      Set((SnapshotTable.LegacyTxnQueryId, 0L)))
    // ANY query asking sees the legacy epoch as committed: the entry
    // carried no query id, so skipping beats double-appending a replay
    assert(SnapshotTable.committedEpochs(dir, "someQuery") == Set(0L))
    assert(SnapshotTable.committedEpochs(dir, "otherQuery") == Set(0L))
  }

  test("RENAME COLUMN without rewrite: a metadata-only commit moves " +
    "the schema and every column-keyed tier to the new name, old " +
    "files read AND stats-prune under it, time travel keeps the old " +
    "name, and DML/appends/re-renames compose") {
    val dir = Files.createTempDirectory("snap-rename").toString
    val st = SnapshotTable
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, i * 10, s"s$i")).toDF("id", "n", "s")
    st.commitMultiStats(spark, mk(0L, 40L).repartition(2), dir,
      statsCols = Seq("n"))                                    // v1
    st.commitMultiStats(spark, mk(40L, 80L).repartition(2), dir,
      statsCols = Seq("n"))                                    // v2
    val diskBefore = st.manifestFiles(dir, 2).toSet
    assert(st.renameColumn(dir, "n", "metric") == 3)           // v3
    // metadata-only: identical file list, rewrite-only for the feed
    assert(st.manifestFiles(dir, 3).toSet == diskBefore)
    assert(!st.isDataChange(dir, 3))
    assert(st.readSchema(dir, 3).get.fieldNames.toSeq ==
      Seq("id", "metric", "s"))
    // old files surface their bytes under the NEW name
    assert(st.readSnapshot(spark, dir)
      .select("id", "metric").as[(Long, Long)].collect().toSet ==
      (0L until 80L).map(i => (i, i * 10)).toSet)
    // stats pruning on the new name serves OLD files from the manifest
    assert(st.statsColumns(dir, 3) == Seq("metric"))
    val pruned = st.readSnapshotPruned(spark, dir, "metric", 0L, 390L)
    assert(pruned.agg(count(lit(1))).as[Long].head() == 40L)
    assert(st.manifestFiles(dir, 3, Some((0L, 390L))).length <
      st.manifestFiles(dir, 3).length)
    // time travel below the rename keeps ITS name
    assert(st.readSnapshot(spark, dir, Some(2)).columns.toSeq ==
      Seq("id", "n", "s"))
    // appends after the rename carry the new name; mixed epochs read
    st.commitMultiStats(spark,
      (80L until 120L).map(i => (i, i * 10, s"s$i"))
        .toDF("id", "metric", "s").repartition(2), dir,
      statsCols = Seq("metric"))                               // v4
    assert(st.readSnapshot(spark, dir)
      .agg(sum("metric")).as[Long].head() ==
      (0L until 120L).map(_ * 10).sum)
    // post-rename appends still take the O(delta) segmented path
    assert(st.readSegments(dir, 4).nonEmpty)
    // CoW DML across mixed epochs: delete by the new name
    st.delete(spark, dir, col("metric") === 110L)              // v5
    assert(st.readSnapshot(spark, dir)
      .where(col("id") === 11L).count() == 0L)
    assert(st.readSnapshot(spark, dir).count() == 119L)
    // RE-rename: two closed epochs deep, reads stay exact
    assert(st.renameColumn(dir, "metric", "m2") == 6)
    assert(st.readEpochs(dir, 6).length == 2)
    assert(st.readSnapshot(spark, dir)
      .agg(sum("m2")).as[Long].head() ==
      (0L until 120L).filterNot(_ == 11L).map(_ * 10).sum)
    // restore below both renames resurrects the original name
    val rv = st.restore(dir, 2)
    assert(st.readSnapshot(spark, dir, Some(rv)).columns.toSeq ==
      Seq("id", "n", "s"))
    assert(st.readSnapshot(spark, dir, Some(rv)).count() == 80L)
    // refusals
    intercept[IllegalArgumentException](
      st.renameColumn(dir, "nope", "x"))
    intercept[IllegalArgumentException](
      st.renameColumn(dir, "id", "s"))
    intercept[IllegalArgumentException](
      st.renameColumn(dir, "id", "bad name"))
  }

  test("compactSmall binpacks ONLY the files under the threshold: " +
    "adequate files carry by identity, content is unchanged, the feed " +
    "skips it, and tombstones on rewritten files fold in") {
    val dir = Files.createTempDirectory("snap-binpack").toString
    val st = SnapshotTable
    // one BIG file (v1, 4k rows) + a drip of small appends (v2..v5)
    st.commit(spark, (0L until 4000L).map(i => (i, s"x$i"))
      .toDF("id", "s").coalesce(1), dir)
    (0 until 4).foreach(k =>
      st.commit(spark, Seq((10000L + k, "tiny")).toDF("id", "s")
        .coalesce(1), dir))
    val files5 = st.manifestFiles(dir, 5)
    val sizes = st.readSizes(dir, 5).get
    val big = files5.zip(sizes).maxBy(_._2)._1
    val threshold = files5.zip(sizes).map(_._2).max // big file >= this
    val v = st.compactSmall(spark, dir, threshold)
    assert(v.contains(6))
    val files6 = st.manifestFiles(dir, 6)
    // the big file carried BY IDENTITY; the four tiny ones binpacked
    assert(files6.contains(big))
    assert(files6.length < files5.length)
    assert(!st.isDataChange(dir, 6))
    assert(st.readSnapshot(spark, dir).count() == 4004L)
    assert(st.readSnapshot(spark, dir)
      .where(col("id") >= 10000L).count() == 4L)
    // idempotent: one binpacked file left under threshold -> None
    assert(st.compactSmall(spark, dir, threshold).isEmpty)
    // MoR tombstones on a small file fold into the binpacked rewrite
    val dirM = Files.createTempDirectory("snap-binpackm").toString
    st.commit(spark, (0L until 100L).map(i => (i, i * 2))
      .toDF("id", "n").coalesce(1), dirM)
    st.commit(spark, (100L until 200L).map(i => (i, i * 2))
      .toDF("id", "n").coalesce(1), dirM)
    st.enableMergeOnRead(dirM)
    st.delete(spark, dirM, col("id") === 150L) // positional tombstone
    assert(st.readDirty(dirM, 3).nonEmpty)
    assert(st.compactSmall(spark, dirM, 1L << 20).contains(4))
    assert(st.readDirty(dirM, 4).isEmpty) // folded
    assert(st.readSnapshot(spark, dirM).count() == 199L)
  }

  test("TAGS pin versions: tagAsOf reads, vacuum retains tagged " +
    "versions until the tag is removed, and re-tagging refuses") {
    val dir = Files.createTempDirectory("snap-tags").toString
    val st = SnapshotTable
    st.commit(spark, Seq((1L, "a")).toDF("id", "s"), dir)       // v1
    st.commit(spark, Seq((2L, "b")).toDF("id", "s"), dir)       // v2
    st.commit(spark, Seq((3L, "c")).toDF("id", "s"), dir)       // v3
    assert(st.tag(dir, "train-v1", Some(1)) == 1)
    assert(st.tag(dir, "latest-blessed") == 3) // default: latest
    assert(st.tags(dir) == Map("train-v1" -> 1, "latest-blessed" -> 3))
    // tagAsOf through the DSv2 source
    val viaTag = spark.read.format("graft.sources.SnapshotSource")
      .option("tagAsOf", "train-v1").load(dir)
    assert(viaTag.count() == 1L)
    intercept[Exception](spark.read
      .format("graft.sources.SnapshotSource")
      .option("tagAsOf", "nope").load(dir).count())
    // re-tagging refuses (tags never silently move)
    intercept[IllegalArgumentException](st.tag(dir, "train-v1", Some(2)))
    // vacuum keeps the TAGGED v1 while untagged v2 drops
    st.commit(spark, Seq((4L, "d")).toDF("id", "s"), dir)       // v4
    st.vacuum(dir, 2)                        // would keep v3,v4 only
    assert(st.versions(dir) == Seq(1, 3, 4)) // v1 pinned by tag
    assert(st.readSnapshot(spark, dir, Some(1)).count() == 1L)
    // removing the tag releases the pin
    st.removeTag(dir, "train-v1")
    intercept[IllegalArgumentException](st.removeTag(dir, "train-v1"))
    st.vacuum(dir, 2)
    assert(st.versions(dir) == Seq(3, 4))
  }

  test("HIDDEN PARTITIONING (truncate + bucket): the derived column " +
    "never exists in the data, predicates on the SOURCE column prune " +
    "cells, DML stays value-pure, appends must keep the transforms, " +
    "and the DSv2 write path refuses") {
    val dir = Files.createTempDirectory("snap-hidtrunc").toString
    val st = SnapshotTable
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, i % 250, s"s${i % 7}")).toDF("id", "n", "s")
    st.commitPartitionedTransforms(spark, mk(0L, 300L), dir,
      Seq(PartTransform.Trunc("n", 100L)))                     // v1
    assert(st.readPartTransforms(dir, 1) == Seq("trunc:100"))
    assert(st.partitionColumns(dir, 1) == Seq("n"))
    // hidden: the data files carry the user's schema only
    assert(st.readSnapshot(spark, dir).columns.toSeq ==
      Seq("id", "n", "s"))
    assert(st.readSnapshot(spark, dir).count() == 300L)
    // cells are value-pure in transform space: 0 / 100 / 200
    assert(st.readPartValues(dir, 1).get.flatten.flatten.toSet ==
      Set("0", "100", "200"))
    // source-equality prune: n=150 keeps only the 100-cell's files,
    // and the residual filter keeps the answer row-exact
    val all = st.manifestFiles(dir, 1)
    val kept = st.manifestFilesPruned(dir, 1, Map.empty,
      Map("n" -> Set(Option("100"))))
    assert(kept.nonEmpty && kept.length < all.length)
    assert(st.readSnapshotPartitioned(spark, dir, Map("n" -> 150L))
      .as[(Long, Long, String)].collect().toSet ==
      (0L until 300L).filter(_ % 250 == 150)
        .map(i => (i, 150L, s"s${i % 7}")).toSet)
    // transform-space RANGE prune (monotone)
    val ranged = st.manifestFilesPruned(dir, 1, Map.empty, Map.empty,
      Map.empty, Map("n" -> (Some("100"), Some("100"))))
    assert(ranged.toSet == kept.toSet)
    // appends must keep the transforms; identity/other specs refuse
    intercept[IllegalArgumentException](
      st.commitPartitioned(spark, mk(300L, 310L), dir, Seq("n")))
    intercept[IllegalArgumentException](
      st.commitPartitionedTransforms(spark, mk(300L, 310L), dir,
        Seq(PartTransform.Trunc("n", 50L))))
    // a matching append SEGMENTS (O(delta) metadata) and carries specs
    st.commitPartitionedTransforms(spark, mk(300L, 400L), dir,
      Seq(PartTransform.Trunc("n", 100L)))                     // v2
    assert(st.readSegments(dir, 2).nonEmpty)
    assert(st.readPartTransforms(dir, 2) == Seq("trunc:100"))
    assert(st.readSnapshot(spark, dir).count() == 400L)
    // CoW DML re-derives pure transform tuples for rewritten files
    st.delete(spark, dir, col("n") === 150L)                   // v3
    assert(st.readPartValues(dir, 3).get.flatten.flatten.toSet
      .subsetOf(Set("0", "100", "200")))
    assert(st.readSnapshot(spark, dir).count() ==
      (0L until 400L).count(_ % 250 != 150))
    // metadata CELL delete: transform-space value drops the whole cell
    st.deletePartitions(dir, Map("n" -> "200"))                // v4
    assert(st.readSnapshot(spark, dir)
      .agg(max(col("n"))).as[Long].head() < 200L)
    // the DSv2/staged write path cannot derive transform tuples: refuse
    // refused either as an undeclared-partitioning staged write or —
    // when the writer declares matching column names — by the
    // transform guard itself
    val e = intercept[IllegalArgumentException](
      st.commitStagedFiles(dir, Seq("data/nope.parquet"),
        st.readSchema(dir, 4).get))
    assert(e.getMessage.contains("transform") ||
      e.getMessage.contains("declare the table's partitioning"))
    val e2 = intercept[IllegalArgumentException](
      st.commitStagedFiles(dir, Seq("data/nope.parquet"),
        st.readSchema(dir, 4).get,
        parts = Some((Seq("n"), Seq(Seq(Option("0")))))))
    assert(e2.getMessage.contains("transform"))
    // BUCKET transform on a string source: exact membership through
    // the portable hash, value-pure cells, exact reads
    val dirB = Files.createTempDirectory("snap-hidbkt").toString
    st.commitPartitionedTransforms(spark, mk(0L, 300L), dirB,
      Seq(PartTransform.Bucket("s", 4)))
    val cells = st.readPartValues(dirB, 1).get.flatten.flatten.toSet
    assert(cells.subsetOf(Set("0", "1", "2", "3")) && cells.size > 1)
    val keptB = st.manifestFilesPruned(dirB, 1, Map.empty,
      Map("s" -> Set(PartTransform.Bucket("s", 4).literal("s3"))))
    assert(keptB.length < st.manifestFiles(dirB, 1).length)
    assert(st.readSnapshotPartitioned(spark, dirB, Map("s" -> "s3"))
      .count() == (0L until 300L).count(_ % 7 == 3))
  }

  test("HIDDEN PARTITIONING (day transform): a filter on the raw " +
    "TIMESTAMP prunes to the day's cells — no hand-maintained date " +
    "column — and dropping a day is one metadata delete") {
    val dir = Files.createTempDirectory("snap-hidday").toString
    val st = SnapshotTable
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val rows = (0L until 240L)
      .map(i => (i, new Timestamp(t0 + i * 30L * 60_000L), i * 2))
      .toDF("id", "ts", "n")                       // 48 half-hours/day
    st.commitPartitionedTransforms(spark, rows, dir,
      Seq(PartTransform.DateUnit("ts", "day")))
    assert(st.readPartTransforms(dir, 1) == Seq("day"))
    assert(st.readPartValues(dir, 1).get.flatten.flatten.toSet ==
      (1 to 5).map(d => f"2026-01-0$d").toSet)
    // range on the RAW timestamp prunes by day cell and stays exact
    val lo = Timestamp.valueOf("2026-01-03 06:00:00")
    val keep = st.manifestFilesPruned(dir, 1, Map.empty, Map.empty,
      Map.empty, Map("ts" -> (Some("2026-01-03"), None)))
    assert(keep.nonEmpty && keep.length < st.manifestFiles(dir, 1).length)
    assert(st.readSnapshot(spark, dir).where(col("ts") >= lo).count() ==
      (0L until 240L).count(i => t0 + i * 30L * 60_000L >= lo.getTime))
    // equality on a day member maps to its cell
    assert(st.readSnapshotPartitioned(spark, dir,
      Map("ts" -> Timestamp.valueOf("2026-01-02 12:00:00")))
      .count() == 1L)
    // "drop the bad day" = ONE metadata commit, zero data IO
    val before = st.manifestFiles(dir, 1).toSet
    st.deletePartitions(dir, Map("ts" -> "2026-01-02"))
    assert(st.manifestFiles(dir, 2).toSet.subsetOf(before))
    assert(st.readSnapshot(spark, dir).count() == 240L - 48L)
    assert(st.readSnapshot(spark, dir)
      .where(date_format(col("ts"), "yyyy-MM-dd") === "2026-01-02")
      .count() == 0L)
  }

  test("RENAME of a PARTITION column: tuples and pruning move to the " +
    "new name, partitioned appends and metadata DELETE keep working") {
    val dir = Files.createTempDirectory("snap-renpart").toString
    val st = SnapshotTable
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, s"g${i % 3}", i * 2)).toDF("id", "grp", "n")
    st.commitPartitioned(spark, mk(0L, 90L), dir, Seq("grp"))  // v1
    assert(st.renameColumn(dir, "grp", "bucket") == 2)         // v2
    assert(st.partitionColumns(dir, 2) == Seq("bucket"))
    // exact partition pruning + reads by the NEW name over OLD files
    assert(st.readSnapshotPartitioned(spark, dir,
      Map("bucket" -> "g1")).count() == (0L until 90L).count(_ % 3 == 1))
    // partitioned append under the new spec name
    st.commitPartitioned(spark, (90L until 120L)
      .map(i => (i, s"g${i % 3}", i * 2)).toDF("id", "bucket", "n"),
      dir, Seq("bucket"))                                      // v3
    assert(st.readSnapshot(spark, dir).count() == 120L)
    assert(st.readSnapshot(spark, dir)
      .where(col("bucket") === "g2").count() ==
      (0L until 120L).count(_ % 3 == 2))
    // metadata partition DELETE decides every file under the new name
    st.deletePartitions(dir, Map("bucket" -> "g0"))            // v4
    assert(st.readSnapshot(spark, dir)
      .where(col("bucket") === "g0").count() == 0L)
    assert(st.readSnapshot(spark, dir).count() ==
      (0L until 120L).count(_ % 3 != 0))
  }
}
