package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.io.SnapshotTable

/** The SQL catalog over snapshot tables: DDL, INSERT commits, CoW
  * DELETE, VERSION AS OF, and the refusal edges. */
class SnapshotCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.tcat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.tcat.root", r)
    r
  }

  test("CREATE/INSERT/INSERT OVERWRITE/DELETE/VERSION AS OF lifecycle") {
    root
    spark.sql("CREATE TABLE tcat.life (id BIGINT, s STRING)")
    // CREATE published an empty readable v1
    assert(spark.sql("SELECT * FROM tcat.life").count() == 0)
    (0L until 100L).map(i => (i, s"a$i")).toDF("id", "s")
      .createOrReplaceTempView("src100")
    spark.sql("INSERT INTO tcat.life SELECT * FROM src100 WHERE id < 60")
    spark.sql("INSERT INTO tcat.life SELECT * FROM src100 WHERE id >= 60")
    assert(spark.sql("SELECT count(*) FROM tcat.life").as[Long].head() == 100)
    // CoW DELETE = a new commit; history stays
    spark.sql("DELETE FROM tcat.life WHERE id < 30")
    assert(spark.sql("SELECT count(*) FROM tcat.life").as[Long].head() == 70)
    assert(spark.sql("SELECT min(id) FROM tcat.life").as[Long].head() == 30)
    val counts = (1 to 4).map(v => spark.sql(
      s"SELECT count(*) FROM tcat.life VERSION AS OF $v").as[Long].head())
    assert(counts == Seq(0L, 60L, 100L, 70L))
    // INSERT OVERWRITE truncates into a fresh version
    spark.sql("INSERT OVERWRITE tcat.life SELECT * FROM src100 WHERE id = 7")
    assert(spark.sql("SELECT * FROM tcat.life").as[(Long, String)]
      .collect().toSeq == Seq((7L, "a7")))
    assert(spark.sql("SELECT count(*) FROM tcat.life VERSION AS OF 4")
      .as[Long].head() == 70)
    spark.sql("DROP TABLE tcat.life")
    intercept[Exception](spark.sql("SELECT * FROM tcat.life").collect())
  }

  test("the catalog is stateless: API commits are immediately visible") {
    root
    spark.sql("CREATE TABLE tcat.ext (id BIGINT)")
    SnapshotTable.commit(spark, (0L until 5L).toDF("id"), s"$root/ext")
    assert(spark.sql("SELECT count(*) FROM tcat.ext").as[Long].head() == 5)
    spark.sql("DROP TABLE tcat.ext")
  }

  test("CREATE TABLE ... PARTITIONED BY: INSERTs inherit the layout, " +
    "SELECT prunes partitions, DELETE on the column is metadata-only, " +
    "ALTER ADD COLUMN keeps the layout, non-identity transforms refuse") {
    root
    spark.sql("CREATE TABLE tcat.pt (id BIGINT, grp STRING, n BIGINT) " +
      "PARTITIONED BY (grp)")
    try {
      val dir = s"$root/pt"
      assert(SnapshotTable.partitionColumns(dir, 1) == Seq("grp"))
      spark.sql("INSERT INTO tcat.pt SELECT id, concat('g', " +
        "CAST(id % 3 AS STRING)) AS grp, id * 2 AS n FROM range(90)")
      val v2 = SnapshotTable.resolveVersion(dir)
      assert(SnapshotTable.partitionColumns(dir, v2) == Seq("grp"))
      assert(SnapshotTable.readPartValues(dir, v2).get.flatten.flatten
        .toSet == Set("g0", "g1", "g2"))
      // pruned SELECT
      assert(spark.sql(
        "SELECT count(*) FROM tcat.pt WHERE grp = 'g1'")
        .as[Long].head() == 30L)
      // metadata-only partition DELETE through SQL
      def diskFiles(): Set[String] = {
        def walk(f: java.io.File): Seq[String] =
          Option(f.listFiles()).getOrElse(Array.empty).flatMap(k =>
            if (k.isDirectory) walk(k)
            else if (k.getName.endsWith(".parquet")) Seq(k.getPath)
            else Seq.empty).toSeq
        walk(new java.io.File(dir, "data")).toSet
      }
      val before = diskFiles()
      spark.sql("DELETE FROM tcat.pt WHERE grp = 'g0'")
      assert(diskFiles() == before) // nothing rewritten or removed
      assert(spark.sql("SELECT count(*) FROM tcat.pt")
        .as[Long].head() == 60L)
      // ALTER ADD COLUMN keeps the declared layout
      spark.sql("ALTER TABLE tcat.pt ADD COLUMN note STRING")
      val v4 = SnapshotTable.resolveVersion(dir)
      assert(SnapshotTable.partitionColumns(dir, v4) == Seq("grp"))
      spark.sql("INSERT INTO tcat.pt SELECT id, 'g9' AS grp, 0L AS n, " +
        "'x' AS note FROM range(5)")
      assert(spark.sql(
        "SELECT count(*) FROM tcat.pt WHERE grp = 'g9'")
        .as[Long].head() == 5L)
      // non-identity transforms refuse loudly
      val err = intercept[Exception](spark.sql(
        "CREATE TABLE tcat.ptbad (id BIGINT, ts TIMESTAMP) " +
          "PARTITIONED BY (days(ts))"))
      assert(err.getMessage.toLowerCase.contains("identity"),
        err.getMessage)
    } finally spark.sql("DROP TABLE tcat.pt")
  }

  test("TIMESTAMP AS OF resolves through the catalog: at-or-before, " +
    "boundary-inclusive, micros→millis flooring exact") {
    root
    locally {
      var tick = 0L
      SnapshotTable.clock.withValue(() => { tick += 1; tick * 1000L }) {
        spark.sql("CREATE TABLE tcat.tt (id BIGINT)") // v1 @ 1000 ms
        SnapshotTable.commit(spark, (0L until 5L).toDF("id"),
          s"$root/tt") // v2 @ 2000 ms
        SnapshotTable.commit(spark, (5L until 7L).toDF("id"),
          s"$root/tt"): Unit // v3 @ 3000 ms
      }
    }
    try {
      def at(secs: Long): Long = spark.sql(
        s"SELECT count(*) FROM tcat.tt TIMESTAMP AS OF " +
          s"timestamp_seconds($secs)").as[Long].head()
      assert(at(1) == 0)  // the empty CREATE commit
      assert(at(2) == 5)  // boundary inclusive
      assert(at(999) == 7) // future → latest
      val pre = intercept[Exception](at(0))
      assert(pre.getMessage.contains("before the table's first"))
    } finally spark.sql("DROP TABLE tcat.tt")
  }

  test("CALL vacuum: keep => n prunes to the newest n; " +
    "older_than_ms => t drops at-or-before t; result reports " +
    "oldest_retained; keep => 0 refuses") {
    root
    locally {
      var tick = 0L
      SnapshotTable.clock.withValue(() => { tick += 1; tick * 1000L }) {
        spark.sql("CREATE TABLE tcat.vac (id BIGINT)") // v1
        SnapshotTable.commit(spark, (0L until 5L).toDF("id"),
          s"$root/vac") // v2
        SnapshotTable.commit(spark, (5L until 9L).toDF("id"),
          s"$root/vac", overwrite = true) // v3
        SnapshotTable.commit(spark, (9L until 10L).toDF("id"),
          s"$root/vac"): Unit // v4
      }
    }
    try {
      // age horizon at v2: v1/v2 drop, the overwrite + append retain
      val byAge = spark.sql("CALL tcat.vacuum(`table` => 'vac', " +
        "older_than_ms => 2000)").collect().head
      assert(byAge.getInt(1) == 3) // oldest_retained
      assert(SnapshotTable.versions(s"$root/vac") == Seq(3, 4))
      assert(spark.sql("SELECT count(*) FROM tcat.vac").as[Long]
        .head() == 5)
      // keep => 1 prunes to the current version only
      val byKeep = spark.sql(
        "CALL tcat.vacuum(`table` => 'vac', keep => 1)").collect().head
      assert(byKeep.getInt(1) == 4)
      assert(SnapshotTable.versions(s"$root/vac") == Seq(4))
      assert(spark.sql("SELECT count(*) FROM tcat.vac").as[Long]
        .head() == 5)
      val bad = intercept[Exception](spark.sql(
        "CALL tcat.vacuum(`table` => 'vac', keep => 0)").collect())
      assert(bad.getMessage.contains("keep >= 1"))
    } finally spark.sql("DROP TABLE tcat.vac")
  }

  test("CALL restore: rolls the table to an older version's content as " +
    "a new commit; the streaming source treats it as a rewrite") {
    root
    spark.sql("CREATE TABLE tcat.res (id BIGINT)") // v1
    SnapshotTable.commit(spark, (0L until 5L).toDF("id"),
      s"$root/res") // v2
    SnapshotTable.commit(spark, (99L until 100L).toDF("id"),
      s"$root/res", overwrite = true) // v3, the bad write
    try {
      val r = spark.sql("CALL tcat.restore(`table` => 'res', " +
        "version => 2)").collect().head
      assert((r.getInt(0), r.getInt(1)) == (2, 4))
      assert(spark.sql("SELECT count(*) FROM tcat.res").as[Long]
        .head() == 5)
      assert(spark.sql(
        "SELECT count(*) FROM tcat.res VERSION AS OF 3").as[Long]
        .head() == 1)
      assert(SnapshotTable.readAction(s"$root/res", 4) == "overwrite")
    } finally spark.sql("DROP TABLE tcat.res")
  }

  test("row-level SQL DML rewrites ONLY the touched groups: runtime " +
    "group filtering carries untouched files by reference") {
    root
    spark.sql("CREATE TABLE tcat.grp (id BIGINT, n BIGINT)")
    // two separate INSERT commits = two disjoint file groups
    spark.sql("INSERT INTO tcat.grp SELECT id, id * 2 FROM range(0, 50)")
    spark.sql("INSERT INTO tcat.grp SELECT id, id * 2 FROM range(50, 100)")
    try {
      val dir = s"$root/grp"
      val before = SnapshotTable.manifestFiles(dir, 3).toSet
      val firstWave = SnapshotTable.manifestFiles(dir, 2).toSet
      spark.sql("UPDATE tcat.grp SET n = n + 1000 WHERE id >= 50")
      val after = SnapshotTable.manifestFiles(dir, 4).toSet
      // untouched groups (the CREATE stub + the first INSERT's files)
      // are carried by REFERENCE, not rewritten
      assert(firstWave.subsetOf(after),
        s"first wave not carried: ${firstWave -- after}")
      // the touched second wave is gone from the new version
      assert((before -- firstWave).intersect(after).isEmpty,
        "touched files were carried instead of rewritten")
      // and the answer is exact
      assert(spark.sql("SELECT sum(n) FROM tcat.grp").as[Long].head() ==
        (0L until 100L).map(_ * 2).sum + 50 * 1000)
      assert(spark.sql(
        "SELECT count(*) FROM tcat.grp WHERE n >= 1000").as[Long]
        .head() == 50)
    } finally spark.sql("DROP TABLE tcat.grp")
  }

  test("CALL compact + CALL history: OPTIMIZE via SQL and the " +
    "manifest-bytes audit trail") {
    root
    locally {
      var tick = 0L
      SnapshotTable.clock.withValue(() => { tick += 1; tick * 1000L }) {
        spark.sql("CREATE TABLE tcat.hist (id BIGINT)") // v1 @ 1000
        SnapshotTable.commit(spark,
          (0L until 40L).toDF("id").repartition(4), s"$root/hist") // v2
        SnapshotTable.commit(spark,
          (40L until 60L).toDF("id").repartition(3), s"$root/hist") // v3
        val c = spark.sql("CALL tcat.compact(`table` => 'hist', " +
          "num_files => 2)").collect().head // v4
        assert((c.getInt(0), c.getInt(1)) == (4, 2))
      }
    }
    try {
      // compaction changed layout, never content
      assert(spark.sql("SELECT count(*) FROM tcat.hist").as[Long]
        .head() == 60)
      val h = spark.sql("CALL tcat.history(`table` => 'hist')")
        .as[(Long, String, Long, Long, Long)].collect().toList
      assert(h.map(r => (r._1, r._2, r._3, r._5)) == List(
        (4L, "overwrite", 4000L, 60L),
        (3L, "append", 3000L, 60L),
        (2L, "append", 2000L, 40L),
        (1L, "append", 1000L, 0L)))
      assert(h.head._4 == 2L) // the compacted version holds 2 files
      // the API spelling agrees
      assert(SnapshotTable.history(spark, s"$root/hist")
        .as[(Long, String, Long, Long, Long)].collect().toList == h)
    } finally spark.sql("DROP TABLE tcat.hist")
  }

  test("refusals: pre-first-commit TIMESTAMP AS OF and bad segment " +
    "names; an untranslatable DELETE now lowers to the CoW row-level " +
    "rewrite instead of refusing") {
    root
    spark.sql("CREATE TABLE tcat.ref (id BIGINT)")
    spark.sql("INSERT INTO tcat.ref VALUES (1), (2), (3)")
    intercept[Exception](spark.sql(
      "SELECT * FROM tcat.ref TIMESTAMP AS OF '2026-01-01'").collect())
    // % is not a v1 Filter: the metadata path declines, and the
    // group-based row-level operation rewrites instead (pre-row-level
    // this refused loudly; it must never silently delete WRONG rows)
    spark.sql("DELETE FROM tcat.ref WHERE id % 2 = 0")
    assert(spark.sql("SELECT * FROM tcat.ref ORDER BY id").as[Long]
      .collect().toSeq == Seq(1L, 3L))
    // pre-DML history intact
    assert(spark.sql("SELECT count(*) FROM tcat.ref VERSION AS OF 2")
      .as[Long].head() == 3)
    intercept[Exception](
      spark.sql("SELECT * FROM tcat.`../escape`").collect())
    spark.sql("DROP TABLE tcat.ref")
  }

  test("SQL UPDATE and MERGE INTO lower to the group-based CoW " +
    "row-level operation; history stays; pinned-version DML refuses") {
    root
    spark.sql("CREATE TABLE tcat.dml (id BIGINT, s STRING, n BIGINT)")
    spark.sql("INSERT INTO tcat.dml VALUES (1, 'a', 10), (2, 'b', 20), " +
      "(3, 'c', 30)")
    spark.sql("UPDATE tcat.dml SET n = n + 100, s = upper(s) " +
      "WHERE id % 2 = 1")
    assert(spark.sql("SELECT * FROM tcat.dml ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "A", 110L), (2L, "b", 20L), (3L, "C", 130L)))
    Seq((2L, "B2", 200L), (9L, "i", 90L)).toDF("id", "s", "n")
      .createOrReplaceTempView("dml_src")
    spark.sql("""MERGE INTO tcat.dml t USING dml_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.s = s.s, t.n = s.n
      WHEN NOT MATCHED THEN INSERT (id, s, n) VALUES (s.id, s.s, s.n)""")
    assert(spark.sql("SELECT * FROM tcat.dml ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "A", 110L), (2L, "B2", 200L), (3L, "C", 130L),
        (9L, "i", 90L)))
    // every pre-DML version still reads as it was
    assert(spark.sql("SELECT count(*) FROM tcat.dml VERSION AS OF 2")
      .as[Long].head() == 3)
    assert(spark.sql(
      "SELECT sum(n) FROM tcat.dml VERSION AS OF 3").as[Long]
      .head() == 260L) // post-UPDATE, pre-MERGE
    // DML through a time-traveled reference refuses loudly
    intercept[Exception](spark.sql(
      "UPDATE tcat.dml VERSION AS OF 2 SET n = 0").collect())
    spark.sql("DROP TABLE tcat.dml")
  }

  test("SQL UPDATE/MERGE record change-feed sidecars: UPDATE feeds " +
    "exact pre/postimages, MERGE feeds the net row delta as " +
    "delete/insert, and the feed replays onto the committed table") {
    root
    spark.sql("CREATE TABLE tcat.cdfsql (id BIGINT, s STRING, n BIGINT)")
    SnapshotTable.enableChangeFeed(s"$root/cdfsql")
    spark.sql("INSERT INTO tcat.cdfsql VALUES (1, 'a', 100), " +
      "(2, 'b', 20), (3, 'c', 30)")                              // v2
    // predicate on the ASSIGNED column — the canonical postimage trap
    spark.sql("UPDATE tcat.cdfsql SET n = 999 WHERE n = 100")    // v3
    val f3 = SnapshotTable.readChangeFeed(spark, s"$root/cdfsql", 3, Some(3))
      .select("id", "n", "_change_type")
      .as[(Long, Long, String)].collect().toSet
    assert(f3 == Set((1L, 100L, "update_preimage"),
      (1L, 999L, "update_postimage")), s"got $f3")
    // MERGE mixing update + insert + delete in one commit
    Seq((2L, "B", 200L), (9L, "i", 90L)).toDF("id", "s", "n")
      .createOrReplaceTempView("cdfsql_src")
    spark.sql("""MERGE INTO tcat.cdfsql t USING cdfsql_src s ON t.id = s.id
      WHEN MATCHED AND t.id = 2 THEN UPDATE SET t.s = s.s, t.n = s.n
      WHEN NOT MATCHED THEN INSERT (id, s, n) VALUES (s.id, s.s, s.n)""")
    val f4 = SnapshotTable.readChangeFeed(spark, s"$root/cdfsql", 4, Some(4))
      .select("id", "s", "n", "_change_type")
      .as[(Long, String, Long, String)].collect().toSet
    assert(f4 == Set((2L, "b", 20L, "delete"),
      (2L, "B", 200L, "insert"), (9L, "i", 90L, "insert")), s"got $f4")
    // a MERGE WHEN MATCHED THEN DELETE also feeds its vanished rows
    Seq((3L, "x", 0L)).toDF("id", "s", "n")
      .createOrReplaceTempView("cdfsql_del")
    spark.sql("""MERGE INTO tcat.cdfsql t USING cdfsql_del s ON t.id = s.id
      WHEN MATCHED THEN DELETE""")
    val f5 = SnapshotTable.readChangeFeed(spark, s"$root/cdfsql", 5, Some(5))
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(f5 == Set((3L, "delete")), s"got $f5")
    // replaying the whole feed from v2 reproduces the committed table
    val feed = SnapshotTable.readChangeFeed(spark, s"$root/cdfsql", 2)
      .select("id", "s", "n", "_change_type", "_commit_version")
      .as[(Long, String, Long, String, Long)].collect().sortBy(_._5)
    val replayed = feed.foldLeft(Map.empty[Long, (Long, String, Long)]) {
      case (m, (id, s, n, ct, _)) => ct match {
        case "insert" | "update_postimage" => m + (id -> ((id, s, n)))
        case "delete" => m - id
        case _ => m // update_preimage: superseded by its postimage
      }
    }.values.toSet
    assert(replayed == spark.sql("SELECT * FROM tcat.cdfsql")
      .as[(Long, String, Long)].collect().toSet)
    // a no-op SQL UPDATE (matches nothing) feeds zero rows, loudly not
    spark.sql("UPDATE tcat.cdfsql SET n = 0 WHERE id = 12345")
    val last = SnapshotTable.versions(s"$root/cdfsql").last
    assert(SnapshotTable.readChangeFeed(spark, s"$root/cdfsql",
      last, Some(last)).count() == 0L)
    spark.sql("DROP TABLE tcat.cdfsql")
  }

  test("CALL repair_spec rewrites only the pre-evolution unknown-tuple " +
    "files; a clean table answers -1") {
    root
    val mk = (lo: Long, hi: Long) => (lo until hi)
      .map(i => (i, s"s${i % 3}", i * 2)).toDF("id", "src", "n")
    val dir = s"$root/rsp"
    SnapshotTable.commit(spark, mk(0L, 60L), dir)
    SnapshotTable.commitPartitioned(spark, mk(60L, 120L), dir,
      Seq("src"), evolveSpec = true)
    val before = spark.sql("SELECT * FROM tcat.rsp")
      .as[(Long, String, Long)].collect().toSet
    val r = spark.sql("CALL tcat.repair_spec(table => 'rsp')")
      .as[(Int, Int)].head()
    assert(r._1 == 3 && r._2 > 0, s"got $r")
    assert(SnapshotTable.readPartValues(dir, 3).get
      .forall(t => !t.exists(SnapshotTable.isUnknownPart)))
    assert(spark.sql("SELECT * FROM tcat.rsp")
      .as[(Long, String, Long)].collect().toSet == before)
    // nothing left: -1, zero repaired
    assert(spark.sql("CALL tcat.repair_spec(table => 'rsp')")
      .as[(Int, Int)].head() == ((-1, 0)))
    spark.sql("DROP TABLE tcat.rsp")
  }

  test("rename + listTables") {
    root
    spark.sql("CREATE TABLE tcat.rn1 (id BIGINT)")
    spark.sql("ALTER TABLE tcat.rn1 RENAME TO rn2")
    assert(spark.sql("SHOW TABLES IN tcat").collect()
      .map(_.getString(1)).contains("rn2"))
    assert(spark.sql("SELECT count(*) FROM tcat.rn2").as[Long].head() == 0)
    spark.sql("DROP TABLE tcat.rn2")
  }

  test("ALTER TABLE ADD COLUMN: metadata-only evolution, history keeps " +
    "its pre-ALTER schema, other ALTER verbs refuse") {
    root
    spark.sql("CREATE TABLE tcat.alt (id BIGINT)")
    spark.sql("INSERT INTO tcat.alt VALUES (1), (2)")
    spark.sql("ALTER TABLE tcat.alt ADD COLUMN lang STRING")
    // the ALTER is its own (empty) version: same rows, lang null-filled
    assert(spark.sql("SELECT * FROM tcat.alt").columns.toSeq ==
      Seq("id", "lang"))
    assert(spark.sql(
      "SELECT count(*) FROM tcat.alt WHERE lang IS NULL")
      .as[Long].head() == 2)
    spark.sql("INSERT INTO tcat.alt VALUES (3, 'en')")
    assert(spark.sql("SELECT count(lang) FROM tcat.alt").as[Long].head() == 1)
    // VERSION AS OF across the evolution: v2 (pre-ALTER) has no lang
    assert(spark.sql("SELECT * FROM tcat.alt VERSION AS OF 2")
      .columns.toSeq == Seq("id"))
    assert(spark.sql("SELECT count(*) FROM tcat.alt VERSION AS OF 3")
      .as[Long].head() == 2) // the ALTER commit itself: rows unchanged
    // the evolution rewrote NO data file: v4 still reads v2's files
    // (add-column is O(0) data work, the point of log-held schemas)
    intercept[Exception](
      spark.sql("ALTER TABLE tcat.alt ADD COLUMN id STRING")) // duplicate
    intercept[Exception]( // positions would lie: evolution appends
      spark.sql("ALTER TABLE tcat.alt ADD COLUMN z STRING FIRST"))
    intercept[Exception](
      spark.sql("ALTER TABLE tcat.alt DROP COLUMN lang"))
    intercept[Exception](
      spark.sql("ALTER TABLE tcat.alt ALTER COLUMN id TYPE STRING"))
    spark.sql("DROP TABLE tcat.alt")
  }

  test("CALL tag/tags/remove_tag/compact_small round-trip: the SQL " +
    "spelling of named refs and binpack OPTIMIZE") {
    root
    spark.sql("CREATE TABLE tcat.tagt (id BIGINT, s STRING)")
    val dir = s"$root/tagt"
    (0 until 3).foreach(k => spark.sql(
      s"INSERT INTO tcat.tagt VALUES (${k}L, 'r$k')"))
    assert(spark.sql(
      "CALL tcat.tag(`table` => 'tagt', name => 'rel1', version => 2)")
      .as[Int].head() == 2)
    assert(spark.sql("CALL tcat.tag(`table` => 'tagt', name => 'head')")
      .as[Int].head() == 4)
    assert(spark.sql("CALL tcat.tags(`table` => 'tagt')")
      .as[(String, Int)].collect().toMap ==
      Map("rel1" -> 2, "head" -> 4))
    // tagAsOf read through the source
    assert(spark.read.format("graft.sources.SnapshotSource")
      .option("tagAsOf", "rel1").load(dir).count() == 1L)
    assert(spark.sql("CALL tcat.remove_tag(`table` => 'tagt', " +
      "name => 'rel1')").as[Boolean].head())
    assert(spark.sql("CALL tcat.tags(`table` => 'tagt')").count() == 1L)
    // binpack: three one-row files fold into one; count unchanged
    val before = SnapshotTable.manifestFiles(dir,
      SnapshotTable.versions(dir).last).length
    assert(spark.sql("CALL tcat.compact_small(`table` => 'tagt')")
      .as[Int].head() == 5)
    assert(SnapshotTable.manifestFiles(dir, 5).length < before)
    assert(spark.sql("SELECT count(*) FROM tcat.tagt")
      .as[Long].head() == 3L)
    spark.sql("DROP TABLE tcat.tagt"): Unit
  }

  test("DROP TABLE refuses to delete a non-table directory under root") {
    root
    val stray = new java.io.File(s"$root/stray_dir")
    stray.mkdirs()
    new java.io.File(stray, "precious.txt").createNewFile()
    // no snapshot log inside: the analyzer (and the guard) both say no
    intercept[Exception](spark.sql("DROP TABLE tcat.stray_dir"))
    assert(new java.io.File(stray, "precious.txt").exists(),
      "dropTable deleted a directory that is not a snapshot table")
    // the TableCatalog-level guard holds even when called directly
    val cat = new SnapshotCatalog
    cat.initialize("direct", new org.apache.spark.sql.util
      .CaseInsensitiveStringMap(java.util.Map.of("root", root)))
    assert(!cat.dropTable(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array.empty[String], "stray_dir")))
    assert(new java.io.File(stray, "precious.txt").exists())
  }
}
