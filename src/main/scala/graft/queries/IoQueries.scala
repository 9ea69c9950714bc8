package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{PartitionedWriter, Tables}
import graft.io.Tables.table
import graft.ops.Windows

/** Source/sink coverage (SURVEY.md §2.1): CSV with header (S3), partitioned
  * parquet write with partition-column-as-data read-back (K1 + §3.1 bullet
  * 4), keyed+bounded history scan (S5), approximate distinct (§2.4 note).
  * The write queries round-trip through a temp directory — the sink is part
  * of the measured operator.
  */
object IoQueries {

  /** Bucketed-table co-located join: both sides written `bucketBy` on the
    * join key through the catalog, read back and joined. Bucketing is the
    * 100 TB shuffle eliminator — a fact⋈fact equi-join on the bucket key
    * needs NO exchange (proven plan-level in SkewAndBucketSpec, where
    * auto-broadcast is disabled and the executed plan contains no
    * Exchange); this gated query proves the bucketed write→catalog→read→
    * join path is value-exact. Tables land in the session's warehouse dir;
    * stale dirs from previous JVMs are cleared first (the in-memory
    * catalog forgets tables across runs, the directories persist). */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    def clear(t: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      val wh = s.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val d = new java.io.File(s"$wh/$t")
      if (d.exists()) rm(d)
    }
    Seq("g_bkt_orders", "g_bkt_customer").foreach(clear)
    table(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("g_bkt_orders")
    table(s, dir, "customer").select("c_custkey", "c_name")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("g_bkt_customer")
    s.table("g_bkt_orders")
      .join(s.table("g_bkt_customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("spend"))
      .orderBy("c_custkey")
  }

  /** JSON-lines sink/source roundtrip (the third text format next to
    * parquet and CSV): events written as json-lines, read back with the
    * original schema. Oracle is the identity — the JSON codec must
    * round-trip longs, doubles (shortest-representation print) and
    * strings exactly. */
  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = table(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"), unix_micros(col("ts")).as("ts_us"))
    val tmp = Files.createTempDirectory("graft-json").toString
    src.write.mode("overwrite").json(tmp)
    s.read.schema(src.schema).json(tmp).orderBy("event_id")
  }

  /** ORC sink/source roundtrip (q136): the fourth format tier next to
    * parquet (columnar default), CSV (q43) and json-lines (q75) — events
    * written as ORC, read back, identity oracle. ORC is the other
    * production columnar format a 100 TB lakehouse ingests from (Hive
    * estates); the reader keeps the same predicate-pushdown / column-
    * pruning contract as the parquet scans (ORC carries row-group
    * min/max indexes Spark's OrcScan consumes). Timestamps travel as
    * `unix_micros` longs exactly like q75, so the comparison is
    * codec-neutral integer equality, not timezone-layout luck. */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = table(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"), unix_micros(col("ts")).as("ts_us"))
    val tmp = Files.createTempDirectory("graft-orc").toString
    src.write.mode("overwrite").orc(tmp)
    s.read.orc(tmp).orderBy("event_id")
  }

  /** Z-order layout: events written clustered by the Morton interleave of
    * (user_id, day) — [[graft.io.ZOrder.zValue2]] — then scanned with a
    * predicate on BOTH dimensions. Result parity is the gate; the layout
    * property (row groups tight in both dims → footer min/max prunes for
    * either predicate) is what the sort buys at 100 TB, where "this
    * user's events this week" would otherwise read the whole table. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-zorder").toString
    val ev = table(s, dir, "events")
      .withColumn("day_num",
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long"))
      .select(col("event_id"), col("user_id"), col("value"), col("day_num"))
    ev.withColumn("z", graft.io.ZOrder.zValue2(col("user_id"), col("day_num")))
      .repartitionByRange(8, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(tmp)
    s.read.parquet(tmp)
      .where(col("user_id").between(10, 20) && col("day_num").between(5, 15))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id")
  }

  /** N-dimensional Z-order layout (q84): the q76 story in 3 dimensions —
    * events clustered by the round-robin Morton interleave of
    * (user_id, day, event-class code) via [[graft.io.ZOrder.zValueN]],
    * then scanned with predicates on ALL THREE dimensions. Result parity
    * is the gate; the 3-D interleave property is in ZOrderSpec. */
  def zorderLayout3(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-zorder3").toString
    val ev = table(s, dir, "events")
      .withColumn("day_num",
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long"))
      .withColumn("etype_code",
        when(col("event_type") === "click", 0L)
          .when(col("event_type") === "error", 1L)
          .when(col("event_type") === "purchase", 2L)
          .when(col("event_type") === "signup", 3L)
          .otherwise(4L))
      .select(col("event_id"), col("user_id"), col("value"),
        col("day_num"), col("etype_code"))
    ev.withColumn("z", graft.io.ZOrder.zValueN(
        Seq(col("user_id"), col("day_num"), col("etype_code"))))
      .repartitionByRange(8, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(tmp)
    s.read.parquet(tmp)
      .where(col("user_id").between(10, 20) &&
        col("day_num").between(5, 15) && col("etype_code") <= 2)
      .groupBy("user_id", "etype_code")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "etype_code")
  }

  /** S3 + K-side: write customer as header CSV, read it back with the
    * original schema (no `.rdd` detour; header on both sides). Oracle is
    * the identity — proving the CSV codec round-trips values exactly. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = table(s, dir, "customer")
    val tmp = Files.createTempDirectory("graft-csv").toString
    src.write.mode("overwrite").option("header", "true").csv(tmp)
    s.read.schema(src.schema).option("header", "true").csv(tmp)
      .orderBy("c_custkey")
  }

  /** K1/K2 + §3.1(4): date-partitioned parquet write via partitionBy, then
    * read back and aggregate ON the partition column — the partition value
    * must surface as a readable column exactly like the reference's
    * `submission=<day>` path partitioning did (testpilot_data.py:72-82,
    * profile_daily.py:28,38). */
  def partitionedWriteRead(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-part").toString
    // Partition granularity is a sizing decision: month here — daily
    // partitions of this table would be ~60 rows each (thousands of tiny
    // files); at 100 TB the same judgment applies in reverse (day beats
    // month once a day is tens of GB).
    val withMonth = table(s, dir, "orders")
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
    PartitionedWriter.write(withMonth, tmp, partitionCols = Seq("month"))
    s.read.parquet(tmp)
      .groupBy(col("month").cast("string").as("month"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum("o_totalprice"), 2).as("spend"))
      .orderBy("month")
  }

  /** S5: the HBase-range-scan semantics modeled relationally — per-key
    * history bounded by a date range AND a per-key row limit (reference:
    * get_range(ids, start, end, limit=1000), profile_daily.py:107-113).
    * Limit = most recent 20 events per user via a ranking window.
    *
    * The key set comes the reference's way (profile_daily.py:115,
    * `sc.parallelize(client_ids)`): a small id list is collected
    * driver-side (L2 `limit(n).collect()`), re-parallelized as a Dataset
    * (S6) and semi-joined as the cohort. Config-scale lists only — the
    * collect is bounded by the limit. */
  def historyScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seedIds = table(s, dir, "events").select(col("user_id"))
      .distinct().orderBy("user_id").limit(5)
      .as[Long].collect().toSeq
    val cohort = s.createDataset(seedIds).toDF("user_id")
    Windows.topKPerKey(
        table(s, dir, "events")
          .where(col("ts") >= lit("2024-01-05").cast("timestamp") &&
                 col("ts") < lit("2024-01-20").cast("timestamp"))
          .join(cohort, Seq("user_id"), "left_semi"),
        partitionBy = Seq(col("user_id")),
        orderBy = Seq(col("ts").desc, col("event_id")),
        k = 20)
      .select(col("user_id"), col("rn").cast("long").as("rn"),
        col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .orderBy("user_id", "rn")
  }

  /** S5 as a true DataSourceV2: keyed range scan with pushed-down id
    * bounds ([[graft.sources.RangeSource]]) — the filter narrows the scan
    * itself (HBase start/stop-key semantics), then a normal aggregation
    * runs on top. Oracle re-derives the same rows from DuckDB's range(). */
  def dsv2RangeScan(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.RangeSource")
      .option("start", "0").option("end", "100000").option("slices", "8")
      .load()
      .where(col("id") >= 25000L && col("id") < 75000L)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("id").as("id_sum"))
      .orderBy("bucket")

  /** approx_count_distinct (HLL++) sanity-checked against the exact count:
    * the estimate must land within 15% (both engines' sketches differ in
    * implementation, so the oracle checks its own estimate the same way —
    * the *flag* is the comparable output). */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_custkey")).as("exact_cnt"),
        approx_count_distinct(col("o_custkey")).as("approx"))
      .select(col("o_orderpriority"), col("exact_cnt"),
        (abs(col("approx") - col("exact_cnt")) <=
          col("exact_cnt") * 0.15).as("approx_ok"))
      .orderBy("o_orderpriority")

  /** Build the three-version snapshot log q148/q149 read: v1 appends the
    * doc_id≡0 (mod 3) slice, v2 appends the ≡1 slice, v3 OVERWRITES with
    * the ≡0 (mod 5) slice — append-after-append-after-overwrite is the
    * daily-job lifecycle (accumulate, accumulate, full re-run). */
  private def stageSnapshots(s: SparkSession, dir: String): String = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-snap").toString
    graft.io.SnapshotTable.commit(s, docs.where(pmod(col("doc_id"), lit(3L)) === 0), t)
    graft.io.SnapshotTable.commit(s, docs.where(pmod(col("doc_id"), lit(3L)) === 1), t)
    graft.io.SnapshotTable.commit(s, docs.where(pmod(col("doc_id"), lit(5L)) === 0), t,
      overwrite = true)
    t
  }

  /** Snapshot time travel (q148, [[graft.io.SnapshotTable]]): every
    * retained version read AS OF its manifest and aggregated — the same
    * query over v1/v2/v3 sees three different tables from one directory.
    * Readers plan from one manifest file, never a directory listing; an
    * overwrite keeps prior versions readable because data files are
    * immutable. */
  def snapshotTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val t = stageSnapshots(s, dir)
    graft.io.SnapshotTable.versions(t).map { v =>
      graft.io.SnapshotTable.readSnapshot(s, t, Some(v))
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_id"),
          sum("n_chars").as("sum_chars"))
        .select(lit(v).as("version"), col("n_docs"), col("sum_id"),
          col("sum_chars"))
    }.reduce(_.unionAll(_)).orderBy("version")
  }

  /** Snapshot table through the DSv2 READ surface (q214,
    * [[graft.sources.SnapshotSource]]): the q148 three-version log
    * committed WITH doc_id stats, then every version read back through
    * plain `spark.read.format(...)` + a temp view — raw SQL reaching
    * time travel, the consumer surface Delta/Iceberg users live on
    * (q148 proves the storage layer; this proves a SQL user needs no
    * API). Leg 4 re-reads v3 under a doc_id range predicate: the range
    * filter reaches the source's `SupportsPushDownFilters`, prunes
    * files against the manifest min/max at PLANNING time (the q154
    * skipping tier as DSv2 pushdown), and is re-applied row-level as a
    * residual. `repartitionByRange` makes per-file doc_id ranges
    * disjoint so the pruning is real — SnapshotSourceSpec asserts the
    * partition count drops. */
  def snapshotSqlRead(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-snapsql").toString
    val st = graft.io.SnapshotTable
    def slice(c: org.apache.spark.sql.Column) =
      docs.where(c).repartitionByRange(4, col("doc_id"))
    st.commitWithStats(s, slice(pmod(col("doc_id"), lit(3L)) === 0), t,
      statsCol = Some("doc_id"))
    st.commitWithStats(s, slice(pmod(col("doc_id"), lit(3L)) === 1), t,
      statsCol = Some("doc_id"))
    st.commitWithStats(s, slice(pmod(col("doc_id"), lit(5L)) === 0), t,
      overwrite = true, statsCol = Some("doc_id"))
    val legs = st.versions(t).map { v =>
      s.read.format("graft.sources.SnapshotSource")
        .option("versionAsOf", v).load(t)
        .createOrReplaceTempView(s"snap_v$v")
      s.sql(s"""SELECT $v AS leg, count(*) AS n_docs,
        sum(doc_id) AS sum_id, sum(n_chars) AS sum_chars FROM snap_v$v""")
    } :+ s.sql("""SELECT 4 AS leg, count(*) AS n_docs,
      sum(doc_id) AS sum_id, sum(n_chars) AS sum_chars
      FROM snap_v3 WHERE doc_id BETWEEN 100 AND 399""")
    legs.reduce(_.unionAll(_)).orderBy("leg")
  }

  /** Snapshot table through the DSv2 WRITE surface (q218,
    * [[graft.sources.SnapshotSource]]): the q214 read-side twin — three
    * commits staged with plain `df.write.format(...).mode(...)` (append,
    * schema-EVOLVING append that adds `lang`, overwrite), writer-folded
    * doc_id stats via `.option("statsCol", ...)`, then every version
    * read back through the DSv2 source + SQL. Legs report count/sums
    * plus `n_lang` (non-null lang), which pins the evolution contract:
    * v2's pre-evolution files null-fill lang, so n_lang counts exactly
    * the appended slice; v1/v3 schemas carry no lang at all. Leg 4
    * re-reads v3 under the doc_id range — the WRITER's folded stats
    * prune files at planning time (SnapshotSourceSpec asserts the
    * partition drop). A SQL user now round-trips the lakehouse tier
    * with zero API calls. */
  def snapshotSqlWrite(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val t = Files.createTempDirectory("graft-snapw").toString
    def save(df: org.apache.spark.sql.DataFrame, mode: String): Unit =
      df.repartitionByRange(4, col("doc_id"))
        .write.format("graft.sources.SnapshotSource")
        .option("statsCol", "doc_id").mode(mode).save(t)
    val slim = docs.select(col("doc_id"), col("source"), col("n_chars"))
    save(slim.where(pmod(col("doc_id"), lit(3L)) === 0), "append")
    save(docs.select(col("doc_id"), col("source"), col("n_chars"),
      col("lang")).where(pmod(col("doc_id"), lit(3L)) === 1), "append")
    save(slim.where(pmod(col("doc_id"), lit(5L)) === 0), "overwrite")
    def read(v: Int) = s.read.format("graft.sources.SnapshotSource")
      .option("versionAsOf", v).load(t)
    def leg(n: Int, df: org.apache.spark.sql.DataFrame) = {
      val nLang = if (df.columns.contains("lang")) count(col("lang"))
                  else lit(0L)
      df.agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_id"),
          sum("n_chars").as("sum_chars"), nLang.as("n_lang"))
        .select(lit(n.toLong).as("leg"), col("n_docs"), col("sum_id"),
          col("sum_chars"), col("n_lang"))
    }
    Seq(leg(1, read(1)), leg(2, read(2)), leg(3, read(3)),
        leg(4, read(3).where(col("doc_id").between(100, 399))))
      .reduce(_.unionAll(_)).orderBy("leg")
  }

  /** Snapshot tables through a SQL CATALOG (q219,
    * [[graft.sources.SnapshotCatalog]]): the full lakehouse lifecycle in
    * nothing but SQL — `CREATE TABLE` (publishes an empty readable v1),
    * two `INSERT INTO` append commits, a `DELETE FROM` that lowers
    * through SupportsDelete to the copy-on-write q157 delete, and
    * `VERSION AS OF` time travel reading every intermediate state
    * (including the post-delete proof that history is immutable). This
    * is the surface Delta/Iceberg users actually operate — q214/q218
    * cover the path-based reader/writer; this covers the catalog. The
    * fifth leg reads across an `ALTER TABLE ADD COLUMN` — a
    * metadata-only schema-evolving empty commit (v5), after which one
    * more INSERT populates the new column (v6) while every pre-ALTER
    * file null-fills it; `VERSION AS OF` still reads v4 with its
    * pre-ALTER schema (history keeps the schema it had). The catalog
    * root is a per-JVM temp directory (catalog instances are cached
    * per session, so the root must be stable within one JVM — but a
    * crashed run must not leak state into a fixed world-writable
    * path); table names are unique per run and dropped in a finally. */
  private lazy val catalogRoot: String =
    Files.createTempDirectory("graft-snapcat").toString
  def snapshotCatalogSql(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.SnapshotCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.root", catalogRoot)
    val t = "t_" + java.util.UUID.randomUUID.toString.replace("-", "")
      .take(12)
    table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .createOrReplaceTempView("q219_src")
    s.sql(s"CREATE TABLE graft_cat.$t " +
      "(doc_id BIGINT, source STRING, n_chars BIGINT)")
    try {
      s.sql(s"INSERT INTO graft_cat.$t SELECT doc_id, source, n_chars " +
        "FROM q219_src WHERE doc_id % 3 = 0")
      s.sql(s"INSERT INTO graft_cat.$t SELECT doc_id, source, n_chars " +
        "FROM q219_src WHERE doc_id % 3 = 1")
      s.sql(s"DELETE FROM graft_cat.$t WHERE doc_id < 250")
      s.sql(s"ALTER TABLE graft_cat.$t ADD COLUMN lang STRING")
      s.sql(s"INSERT INTO graft_cat.$t " +
        "SELECT doc_id, source, n_chars, lang " +
        "FROM (SELECT d.*, 'xx' AS lang FROM q219_src d) " +
        "WHERE doc_id % 3 = 2 AND doc_id >= 250")
      val legs = (1 to 6).map { v =>
        val nLang = if (v >= 5) "count(lang)" else "0"
        s.sql(s"""SELECT $v AS leg, count(*) AS n_docs,
          coalesce(sum(doc_id), 0) AS sum_id,
          coalesce(sum(n_chars), 0) AS sum_chars,
          $nLang AS n_lang
          FROM graft_cat.$t VERSION AS OF $v""")
      }
      legs.reduce(_.unionAll(_)).orderBy("leg")
        .localCheckpoint() // materialize before the table drops
    } finally s.sql(s"DROP TABLE graft_cat.$t")
  }

  /** Compaction + retention (q151): the q148 log compacted to 2 files
    * (a content-identical overwrite commit — `OPTIMIZE`) and vacuumed
    * to the compacted version only; output is the surviving content.
    * The lifecycle a daily 100 TB append log needs: accumulate small
    * commits, periodically rewrite to scan-sized files, reclaim the
    * superseded bytes. File-count and history-pruning assertions live
    * in SnapshotTableSpec; the oracle checks the invariant that matters
    * — compaction and vacuum change LAYOUT, never content. */
  def snapshotCompact(s: SparkSession, dir: String): DataFrame = {
    val t = stageSnapshots(s, dir)
    graft.io.SnapshotTable.compact(s, t, numFiles = 2)
    graft.io.SnapshotTable.vacuum(t, keep = 1)
    graft.io.SnapshotTable.readSnapshot(s, t).orderBy("doc_id")
  }

  /** Manifest-stats pruned range scan (q154,
    * [[graft.io.SnapshotTable.commitWithStats]]): documents committed
    * range-partitioned on doc_id with per-file (min, max) recorded in
    * the manifest, an append on top (stats carried + extended), then a
    * doc_id range read that plans ONLY the overlapping files — file
    * skipping decided on manifest bytes before any footer is opened,
    * the Iceberg data-skipping core. The pruning itself is asserted in
    * SnapshotTableSpec (inputFiles strictly fewer); the oracle checks
    * the invariant that matters: pruning never changes results. */
  def snapshotPrunedScan(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-snapstats").toString
    graft.io.SnapshotTable.commitWithStats(s,
      docs.where(pmod(col("doc_id"), lit(2L)) === 0)
        .repartitionByRange(4, col("doc_id")),
      t, statsCol = Some("doc_id"))
    graft.io.SnapshotTable.commitWithStats(s,
      docs.where(pmod(col("doc_id"), lit(2L)) === 1)
        .repartitionByRange(4, col("doc_id")),
      t, statsCol = Some("doc_id"))
    graft.io.SnapshotTable.readSnapshotPruned(s, t, "doc_id",
        lo = 100L, hi = 199L)
      .orderBy("doc_id")
  }

  /** Bloom-indexed snapshot point lookup (q211,
    * [[graft.io.SnapshotBloom]]): the equality-predicate complement of
    * q154's min/max range skipping — hash-distributed commits make
    * every file's doc_id range FULL-WIDTH (min/max skipping prunes
    * NOTHING for a point key; the adversarial layout for stats), then a
    * per-file Bloom sidecar turns each point lookup into a scan of the
    * handful of might-contain files. Five lookups (one absent) union
    * into the result; the Bloom is invisible in the answer — false
    * positives cost a file scan, never a wrong row. */
  def snapshotBloomLookup(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-snapbloom").toString
    // hash layout: every file spans the full doc_id range
    graft.io.SnapshotTable.commit(s,
      docs.where(pmod(col("doc_id"), lit(2L)) === 0).repartition(4), t)
    graft.io.SnapshotTable.commit(s,
      docs.where(pmod(col("doc_id"), lit(2L)) === 1).repartition(4), t)
    graft.io.SnapshotBloom.buildIndex(s, t, "doc_id", fpp = 0.001,
      expectedItemsPerFile = 100000L)
    Seq(7L, 123L, 321L, 444L, 999999L) // the last id does not exist
      .map(v => graft.io.SnapshotBloom.pointLookup(s, t, "doc_id", v))
      .reduce(_ unionByName _)
      .orderBy("doc_id")
  }

  /** Snapshot diff (q149): the row-level change set between v2 and the
    * v3 overwrite, keyed by doc_id — time travel's other half (what
    * changed, not just what was). */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val t = stageSnapshots(s, dir)
    graft.io.SnapshotTable.diff(s, t, fromV = 2, toV = 3, idCol = "doc_id")
      .orderBy("change", "doc_id")
  }

  /** Schema evolution (q155, [[graft.io.SnapshotTable]]): three append
    * waves, each with a DIFFERENT column set — v1 (doc_id, lang), v2
    * adds n_chars, v3 drops lang from its files and adds source. The
    * table schema lives in the manifest log (the Delta insight), so
    * every wave is a metadata-only evolution: no file is rewritten,
    * readers plan the latest version with the accumulated schema and
    * each file null-fills the columns it predates — exactly what a
    * year-long daily ingest does when the extractor grows fields. The
    * read-side laws (history keeps its own schema, type changes refused)
    * are in SnapshotTableSpec; the oracle checks the visible contract:
    * which (row, column) cells are populated vs null. */
  def snapshotEvolve(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val t = Files.createTempDirectory("graft-snapevolve").toString
    val m = pmod(col("doc_id"), lit(3L))
    graft.io.SnapshotTable.commit(s,
      docs.where(m === 0).select(col("doc_id"), col("lang")), t)
    graft.io.SnapshotTable.commit(s,
      docs.where(m === 1).select(col("doc_id"), col("lang"), col("n_chars")), t)
    graft.io.SnapshotTable.commit(s,
      docs.where(m === 2).select(col("doc_id"), col("n_chars"), col("source")), t)
    graft.io.SnapshotTable.readSnapshot(s, t).orderBy("doc_id")
  }

  /** Copy-on-write DELETE (q157, [[graft.io.SnapshotTable.delete]]):
    * documents committed in two range-partitioned stats-bearing waves
    * (even doc_ids, then odd), then `DELETE WHERE doc_id % 2 = 1 AND
    * lang = 'de'` — a predicate that can only match the second wave's
    * files, so the first wave is carried by reference (asserted in
    * SnapshotTableSpec) while only the touched files rewrite their
    * survivors. Output is the per-language profile before and after the
    * DML commit, both read from the same log — the delete is a new
    * version, history stays readable. */
  def snapshotDelete(s: SparkSession, dir: String): DataFrame = {
    val (t, preV) = stageDmlSnapshots(s, dir)
    val m = pmod(col("doc_id"), lit(2L))
    graft.io.SnapshotTable.delete(s, t, m === 1 && col("lang") === "de")
    dmlProfile(s, t, preV)
  }

  /** Copy-on-write UPDATE (q158, [[graft.io.SnapshotTable.update]]):
    * the q157 staging with `UPDATE SET n_chars = n_chars + 1000 WHERE
    * doc_id % 2 = 1 AND lang = 'de'` — again only the second wave's
    * files can match, so the first wave carries by reference while the
    * touched files rewrite with the assignment applied to predicate-true
    * rows only. Output is the same before/after per-language profile;
    * the after side shows de rows' chars shifted, every other row and
    * the pre-DML version byte-identical. */
  def snapshotUpdate(s: SparkSession, dir: String): DataFrame = {
    val (t, preV) = stageDmlSnapshots(s, dir)
    val m = pmod(col("doc_id"), lit(2L))
    graft.io.SnapshotTable.update(s, t, m === 1 && col("lang") === "de",
      Map("n_chars" -> (col("n_chars") + lit(1000L)).cast("long")))
    dmlProfile(s, t, preV)
  }

  /** MERGE INTO (q159, [[graft.io.SnapshotTable.merge]]): the q157
    * staging, then one merge commit carrying BOTH clause kinds — WHEN
    * MATCHED updates (every doc_id ≡ 1 (mod 10) gets lang 'xx' with a
    * NULL n_chars that keeps the base value, the partial-delta
    * contract) and WHEN NOT MATCHED inserts (a shifted-key slice).
    * Matched keys are all odd, so only the odd wave's files rewrite;
    * the even wave carries by reference (asserted in
    * SnapshotTableSpec). Output is the before/after per-language
    * profile: 'xx' appears, 'new' appears, and the n_chars mass of the
    * updated rows is UNCHANGED — the NULL-keeps-base proof visible in
    * the aggregate. */
  def snapshotMerge(s: SparkSession, dir: String): DataFrame = {
    val (t, preV) = stageDmlSnapshots(s, dir)
    val docs = table(s, dir, "documents")
    val updates = docs.where(pmod(col("doc_id"), lit(10L)) === 1)
      .select(col("doc_id"), lit("xx").as("lang"),
        lit(null).cast("long").as("n_chars"))
    val inserts = docs.where(pmod(col("doc_id"), lit(50L)) === 0)
      .select((col("doc_id") + 100000000L).as("doc_id"),
        lit("new").as("lang"), (col("n_chars") + 1L).cast("long").as("n_chars"))
    graft.io.SnapshotTable.merge(s, t, updates.unionByName(inserts),
      Seq("doc_id"))
    dmlProfile(s, t, preV)
  }

  /** Write-audit-publish (q160, [[graft.io.SnapshotTable.commitAudited]]
    * over [[graft.ops.Expectations]]): a corrupted slice (negative
    * n_chars planted on doc_id ≡ 0 (mod 97)) is staged, audited, and
    * REFUSED — the log stays empty, the stage is removed — then the
    * clean corpus passes the same checks and publishes. Output is both
    * audit reports plus a final row proving exactly one version is
    * visible with the full corpus: the promotion gate a daily ingest
    * runs BEFORE readers can see the version, not after. */
  def snapshotAudited(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
    val t = Files.createTempDirectory("graft-snapwap").toString
    val bad = docs.withColumn("n_chars",
      when(pmod(col("doc_id"), lit(97L)) === 0, lit(-1L))
        .otherwise(col("n_chars")))
    val checks = Seq(graft.ops.Expectations.RowCheck("n_chars_nonneg",
      col("n_chars") >= 0))
    val uniq = Seq(graft.ops.Expectations.UniqueCheck("unique_doc",
      Seq("doc_id")))
    val (v1, r1) = graft.io.SnapshotTable.commitAudited(s, bad, t, checks, uniq)
    val (v2, r2) = graft.io.SnapshotTable.commitAudited(s, docs, t, checks, uniq)
    val tableRow = graft.io.SnapshotTable.readSnapshot(s, t)
      .agg(count(lit(1)).as("violations"))
      .select(lit("table").as("attempt"), lit("rows_visible").as("check_name"),
        col("violations"),
        lit(v1.isEmpty && v2.contains(1) &&
          graft.io.SnapshotTable.versions(t) == Seq(1)).as("pass"))
    def tag(r: DataFrame, attempt: String): DataFrame =
      r.select(lit(attempt).as("attempt"), col("check_name"),
        col("violations"), col("pass"))
    tag(r1, "bad").unionByName(tag(r2, "good")).unionByName(tableRow)
      .orderBy("attempt", "check_name")
  }

  /** q157/q158 staging: documents in two range-partitioned stats-bearing
    * waves (even doc_ids, then odd) — the DML predicates target the odd
    * wave so the even wave's files must carry by reference. Returns the
    * table dir and the pre-DML version. */
  private def stageDmlSnapshots(s: SparkSession, dir: String): (String, Int) = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
    val t = Files.createTempDirectory("graft-snapdml").toString
    val m = pmod(col("doc_id"), lit(2L))
    graft.io.SnapshotTable.commitWithStats(s,
      docs.where(m === 0).repartitionByRange(4, col("doc_id")),
      t, statsCol = Some("doc_id"))
    graft.io.SnapshotTable.commitWithStats(s,
      docs.where(m === 1).repartitionByRange(4, col("doc_id")),
      t, statsCol = Some("doc_id"))
    (t, graft.io.SnapshotTable.versions(t).last)
  }

  /** `TIMESTAMP AS OF` time travel (q227,
    * [[graft.io.SnapshotTable.resolveTimestamp]]): the time-travel
    * spelling users type first. Three commits land at injected
    * wall-clocks one minute apart (the clock is manifest METADATA — it
    * never touches a data path — and is restored in a finally), then
    * four reads pin the whole resolution contract: a timestamp BETWEEN
    * commits resolves DOWN to the version a query at that instant saw
    * (leg 1 → v1), an exact commit timestamp is INCLUSIVE (leg 2 → v2,
    * the Delta at-or-before convention), a timestamp past the last
    * commit reads the latest (leg 3 → v3 — including across the
    * overwrite, so "latest at t" is never confused with "all files ever
    * live at t"), and the catalog SQL spelling `TIMESTAMP AS OF`
    * resolves identically through `loadTable(ident, timestampMicros)`
    * (leg 4 → v1, micros→millis flooring exact on the boundary).
    * Pre-first-commit and untimestamped-log refusals are spec-covered
    * (they are exceptions, not rows). */
  def snapshotTimestampTravel(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    s.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.SnapshotCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.root", catalogRoot)
    val name = "t_" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(12)
    val t = s"$catalogRoot/$name"
    val st = graft.io.SnapshotTable
    val base = 1_000_000_000_000L // 2001-09-09T01:46:40Z
    locally {
      var tick = 0L
      // withValue scopes the injected clock to THIS thread and block —
      // a concurrent commit to another table keeps wall-clock
      st.clock.withValue(() => { tick += 1; base + tick * 60_000L }) {
        st.commit(s, docs.where(pmod(col("doc_id"), lit(4L)) === 0), t)
        st.commit(s, docs.where(pmod(col("doc_id"), lit(4L)) === 1), t)
        st.commit(s, docs.where(pmod(col("doc_id"), lit(5L)) === 0), t,
          overwrite = true): Unit
      }
    }
    def read(tsMillis: Long) = s.read
      .format("graft.sources.SnapshotSource")
      .option("timestampAsOf", tsMillis).load(t)
    def leg(n: Int, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum("doc_id"), lit(0L)).as("sum_id"),
          coalesce(sum("n_chars"), lit(0L)).as("sum_chars"))
        .select(lit(n.toLong).as("leg"), col("n_docs"), col("sum_id"),
          col("sum_chars"))
    try {
      // timestamp_seconds(<long>) is timezone-free: the SQL leg pins
      // the catalog resolution without depending on string-literal
      // parsing under the session timezone
      val sqlLeg = leg(4, s.sql(s"SELECT * FROM graft_cat.$name " +
        s"TIMESTAMP AS OF timestamp_seconds(${base / 1000 + 60})"))
      Seq(
        leg(1, read(base + 90_000L)),  // between v1 and v2 → v1
        leg(2, read(base + 120_000L)), // exact boundary → v2 (inclusive)
        leg(3, read(base + 3_600_000L)), // past the last commit → v3
        sqlLeg
      ).reduce(_.unionAll(_)).orderBy("leg")
        .localCheckpoint() // materialize before the table drops
    } finally s.sql(s"DROP TABLE graft_cat.$name")
  }

  /** Guarded retention via the SQL `CALL` surface (q228,
    * [[graft.io.SnapshotTable.vacuumOlderThan]]): the lakehouse
    * lifecycle verb a daily-append 100 TB table cannot live without —
    * without retention the log accumulates one manifest per commit and
    * every superseded overwrite's data files forever. Four commits at
    * injected wall-clocks, then `CALL graft_cat.vacuum(table => ...,
    * older_than_ms => t2)` drops exactly the versions at-or-before the
    * horizon (v1, v2) and keeps the overwrite (v3) and the append on
    * top of it (v4). Leg 0 pins the procedure's `oldest_retained`
    * answer (3 — the horizon landed where age said, never past the
    * current version); legs 1/2 prove the retained history stays
    * EXACTLY readable after the vacuum (`VERSION AS OF 3`, then the
    * current table). The guard rails — below-horizon reads failing
    * loudly with the vacuum named, `keep >= 1` refusing to drop the
    * current version, a below-horizon streaming source erroring instead
    * of silently skipping — are exceptions, spec-covered. */
  def snapshotRetention(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    s.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.SnapshotCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.root", catalogRoot)
    val name = "t_" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(12)
    val t = s"$catalogRoot/$name"
    val st = graft.io.SnapshotTable
    val base = 1_000_000_000_000L
    locally {
      var tick = 0L
      st.clock.withValue(() => { tick += 1; base + tick * 60_000L }) {
        st.commit(s, docs.where(pmod(col("doc_id"), lit(3L)) === 0), t)
        st.commit(s, docs.where(pmod(col("doc_id"), lit(3L)) === 1), t)
        st.commit(s, docs.where(pmod(col("doc_id"), lit(5L)) === 0), t,
          overwrite = true)
        st.commit(s, docs.where(pmod(col("doc_id"), lit(5L)) === 3), t): Unit
      }
    }
    try {
      val call = s.sql(s"CALL graft_cat.vacuum(`table` => '$name', " +
        s"older_than_ms => ${base + 120_000L})")
      // deleted_files COUNT is layout-dependent (a function of write
      // partitioning, not semantics) — only oldest_retained is pinned
      val leg0 = call.select(lit(0L).as("leg"),
        col("oldest_retained").cast("long").as("n_docs"),
        lit(0L).as("sum_id"), lit(0L).as("sum_chars"))
      def leg(n: Int, df: DataFrame) =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum("doc_id"), lit(0L)).as("sum_id"),
            coalesce(sum("n_chars"), lit(0L)).as("sum_chars"))
          .select(lit(n.toLong).as("leg"), col("n_docs"), col("sum_id"),
            col("sum_chars"))
      Seq(leg0,
        leg(1, s.sql(s"SELECT * FROM graft_cat.$name VERSION AS OF 3")),
        leg(2, s.sql(s"SELECT * FROM graft_cat.$name"))
      ).reduce(_.unionAll(_)).orderBy("leg")
        .localCheckpoint() // materialize before the table drops
    } finally s.sql(s"DROP TABLE graft_cat.$name")
  }

  /** RESTORE after a bad write (q229, [[graft.io.SnapshotTable.restore]]
    * + the `CALL graft_cat.restore(...)` SQL spelling): the rollback
    * verb every lakehouse incident runbook starts with. Two good
    * appends, then an overwrite that "lost" most of the table (the bad
    * write), then `CALL restore(version => 2)` publishes v4 whose
    * content is exactly v2's — METADATA-ONLY: the manifest re-references
    * v2's immutable files, so rolling back a 100 TB table costs one
    * manifest write and zero data movement. Leg 0 pins the procedure's
    * (restored_from, new_version) answer; leg 1 reads the restored
    * current table (== v2's content); leg 2 proves roll-FORWARD
    * semantics — the bad v3 stays in history, still time-travelable,
    * until retention drops it; leg 3 appends on top of the restore and
    * reads the combined state (life goes on from the restored content,
    * not the bad write). */
  def snapshotRestore(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    s.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.SnapshotCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.root", catalogRoot)
    val name = "t_" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(12)
    val t = s"$catalogRoot/$name"
    val st = graft.io.SnapshotTable
    st.commit(s, docs.where(pmod(col("doc_id"), lit(3L)) === 0), t)
    st.commit(s, docs.where(pmod(col("doc_id"), lit(3L)) === 1), t)
    st.commit(s, docs.where(col("doc_id") === 0), t, overwrite = true)
    try {
      val call = s.sql(
        s"CALL graft_cat.restore(`table` => '$name', version => 2)")
      val leg0 = call.select(lit(0L).as("leg"),
        col("restored_from").cast("long").as("n_docs"),
        col("new_version").cast("long").as("sum_id"),
        lit(0L).as("sum_chars"))
      def leg(n: Int, df: DataFrame) =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum("doc_id"), lit(0L)).as("sum_id"),
            coalesce(sum("n_chars"), lit(0L)).as("sum_chars"))
          .select(lit(n.toLong).as("leg"), col("n_docs"), col("sum_id"),
            col("sum_chars"))
      st.commit(s, docs.where(pmod(col("doc_id"), lit(3L)) === 2), t)
      Seq(leg0,
        leg(1, s.sql(s"SELECT * FROM graft_cat.$name VERSION AS OF 4")),
        leg(2, s.sql(s"SELECT * FROM graft_cat.$name VERSION AS OF 3")),
        leg(3, s.sql(s"SELECT * FROM graft_cat.$name"))
      ).reduce(_.unionAll(_)).orderBy("leg")
        .localCheckpoint() // materialize before the table drops
    } finally s.sql(s"DROP TABLE graft_cat.$name")
  }

  /** Manifest-answered aggregates (q230,
    * [[graft.sources.SnapshotScanBuilder]] aggregate pushdown +
    * [[graft.io.SnapshotTable.manifestCount]]): the metadata-only-query
    * tier Delta/Iceberg users lean on daily — an unfiltered `count(*)`
    * / `min` / `max` of the stats column answers from the per-file row
    * counts and (min, max) the manifest records at commit time, planned
    * as ONE LocalScan row with ZERO data IO (at 100 TB: a few hundred
    * manifest bytes instead of a full scan; the spec asserts the
    * LocalTableScan plan). Leg 1 is the pushed-down read of the latest
    * version; leg 2 time-travels the pushdown to v1's manifest; leg 3
    * adds a predicate — which keeps the row path (a filtered aggregate
    * must read rows) and must agree with the oracle exactly, proving
    * the shortcut changes the plan, never the answer. */
  def snapshotAggPushdown(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-snapagg").toString
    val st = graft.io.SnapshotTable
    st.commitWithStats(s,
      docs.where(pmod(col("doc_id"), lit(2L)) === 0)
        .repartitionByRange(4, col("doc_id")), t, statsCol = Some("doc_id"))
    st.commitWithStats(s,
      docs.where(pmod(col("doc_id"), lit(2L)) === 1)
        .repartitionByRange(4, col("doc_id")), t, statsCol = Some("doc_id"))
    s.read.format("graft.sources.SnapshotSource").load(t)
      .createOrReplaceTempView("q230_snap")
    s.read.format("graft.sources.SnapshotSource")
      .option("versionAsOf", 1).load(t)
      .createOrReplaceTempView("q230_snap_v1")
    val leg1 = s.sql("""SELECT 1 AS leg, count(*) AS n_docs,
      min(doc_id) AS min_id, max(doc_id) AS max_id FROM q230_snap""")
    val leg2 = s.sql("""SELECT 2 AS leg, count(*) AS n_docs,
      min(doc_id) AS min_id, max(doc_id) AS max_id FROM q230_snap_v1""")
    val leg3 = s.sql("""SELECT 3 AS leg, count(*) AS n_docs,
      min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM q230_snap WHERE doc_id % 7 = 0""")
    leg1.unionAll(leg2).unionAll(leg3).orderBy("leg")
  }

  /** MULTI-COLUMN manifest stats (q235,
    * [[graft.io.SnapshotTable.commitMultiStats]]): one commit tracks
    * per-file (min, max) for doc_id AND n_chars, and planning prunes
    * files on EVERY filtered column — predicates on different columns
    * compound multiplicatively, which is why Iceberg records a stats
    * map per file rather than one column (real predicates rarely all
    * hit the cluster key). Leg 1 filters the primary (range-cluster)
    * column, leg 2 filters ONLY the secondary column, leg 3 filters
    * both; each leg is value-exact against the oracle — pruning is a
    * may-contain file decision, never a row filter (the residual
    * predicate re-applies row-level; SnapshotSourceSpec asserts the
    * file-count drop plan-side). At 100 TB the second column turns a
    * "scan 1/8th" plan into a "scan 1/64th" plan on compound
    * predicates — metadata bytes, zero data IO. */
  def snapshotMultiStats(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-snapms").toString
    val st = graft.io.SnapshotTable
    // range-clustered on doc_id; n_chars stats ride along per file
    st.commitMultiStats(s, docs.repartitionByRange(8, col("doc_id")), t,
      statsCols = Seq("doc_id", "n_chars"))
    s.read.format("graft.sources.SnapshotSource").load(t)
      .createOrReplaceTempView("q235_snap")
    def leg(n: Int, where: String) = s.sql(
      s"""SELECT $n AS leg, count(*) AS n_docs,
         |  coalesce(sum(doc_id), 0L) AS sum_id,
         |  coalesce(sum(n_chars), 0L) AS sum_chars
         |FROM q235_snap WHERE $where""".stripMargin)
    leg(1, "doc_id BETWEEN 100 AND 199")
      .unionAll(leg(2, "n_chars BETWEEN 100 AND 300"))
      .unionAll(leg(3, "doc_id >= 200 AND n_chars BETWEEN 100 AND 300"))
      .orderBy("leg")
  }

  /** HIVE-STYLE PARTITIONED snapshot table (q236,
    * [[graft.io.SnapshotTable.commitPartitioned]]): the Delta/Iceberg
    * identity-partitioning model on the snapshot log — one value-pure
    * file set per partition value, the exact value tuple recorded in
    * the manifest, and the partition column kept IN the data files
    * (partition-column-as-data, the reference's §3.1 semantics:
    * selecting the column needs no path reconstruction). Planning
    * prunes partitions from manifest bytes on equality/IN — EXACT, not
    * may-contain, because files are value-pure — and stats columns
    * compound on top (leg 3 carries a partition equality AND a doc_id
    * range, so the scan opens one partition's overlapping files only;
    * SnapshotSourceSpec asserts the partition-count drop plan-side).
    * Leg 1 = one-partition equality, leg 2 = IN over two partitions,
    * leg 3 = partition ∧ range compound, leg 4 reads the partition
    * column itself back from file bytes. At 100 TB this is the
    * first-order scan reducer: a day-partitioned corpus answers a
    * one-day query from one partition before stats or Blooms run. */
  def snapshotPartitioned(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-snappart").toString
    val st = graft.io.SnapshotTable
    st.commitPartitioned(s, docs, t, Seq("source"),
      statsCols = Seq("doc_id"))
    s.read.format("graft.sources.SnapshotSource").load(t)
      .createOrReplaceTempView("q236_snap")
    def leg(n: Int, where: String) = s.sql(
      s"""SELECT $n AS leg, count(*) AS n_docs,
         |  coalesce(sum(doc_id), 0L) AS sum_id,
         |  coalesce(sum(n_chars), 0L) AS sum_chars
         |FROM q236_snap WHERE $where""".stripMargin)
    val legs = leg(1, "source = 'src3'")
      .unionAll(leg(2, "source IN ('src1', 'src8')"))
      .unionAll(leg(3, "source = 'src5' AND doc_id >= 100"))
    // leg 4: the partition column read back AS DATA (one group row per
    // matched partition value, proving the column lives in file bytes)
    val leg4 = s.sql(
      """SELECT 4 AS leg, count(*) AS n_docs,
        |  coalesce(sum(doc_id), 0L) AS sum_id,
        |  CAST(count(DISTINCT source) AS BIGINT) AS sum_chars
        |FROM q236_snap WHERE source IN ('src2', 'src7')""".stripMargin)
    legs.unionAll(leg4).orderBy("leg")
  }

  /** SHOW PARTITIONS from manifest bytes through the full SQL story
    * (q238): `CREATE TABLE ... PARTITIONED BY (source)` declares the
    * layout in the empty v1, a plain `INSERT INTO` inherits it (the
    * DSv2 writers route rows into value-pure per-tuple files and
    * record exact values), and `CALL graft_cat.partitions(...)`
    * answers the partition inventory — value, file count, row count —
    * from MANIFEST BYTES with zero data IO (at 100 TB the inventory
    * costs the log, never the data). Output = (partition, n_rows) for
    * non-empty tuples; file counts are layout, not semantics, so the
    * oracle is the plain GROUP BY over the source table. */
  def snapshotShowPartitions(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .createOrReplaceTempView("q238_src")
    s.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.SnapshotCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.root", catalogRoot)
    val name = "t_" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(12)
    s.sql(s"CREATE TABLE graft_cat.$name " +
      "(doc_id BIGINT, source STRING, n_chars BIGINT) " +
      "PARTITIONED BY (source)")
    try {
      s.sql(s"INSERT INTO graft_cat.$name " +
        "SELECT doc_id, source, n_chars FROM q238_src")
      s.sql(s"CALL graft_cat.partitions(`table` => '$name')")
        .where(col("n_rows") > 0)
        .select(col("partition"), col("n_rows"))
        .orderBy("partition")
        .localCheckpoint() // materialize before the table drops
    } finally s.sql(s"DROP TABLE graft_cat.$name")
  }

  /** EMBEDDINGS in the lakehouse tier (q239): the engine's own ANN
    * corpus lives in a snapshot table — the native DSv2 writer commits
    * the `embeddings` table with its `array<float>` column intact
    * (v1), appends exact clones of the ten query vectors under shifted
    * ids (v2), and the probe runs over SNAPSHOT SCANS. Leg 1 is the
    * exact brute-force top-5 on `VERSION AS OF 1` — the float arrays
    * roundtrip bit-exact through the native writer and the vectorized
    * nested read, so the sims match the raw-parquet oracle to the
    * digit. Leg 2 is an integrity checksum over the LATEST version
    * (row count + id sum + summed array lengths) proving the appended
    * clones are visible and their arrays arrived whole. Before nested
    * writer support this whole query refused at write time — arrays
    * could not enter the snapshot tier at all. */
  def snapshotEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val t = Files.createTempDirectory("graft-snapemb").toString
    emb.write.format("graft.sources.SnapshotSource")
      .mode("append").save(t)
    emb.where(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000L)
      .write.format("graft.sources.SnapshotSource")
      .mode("append").save(t)
    val v1 = s.read.format("graft.sources.SnapshotSource")
      .option("versionAsOf", 1).load(t)
    val latest = s.read.format("graft.sources.SnapshotSource").load(t)
    val leg1 = graft.llm.Similarity
      .bruteForceTopK(v1.where(col("vec_id") < 10), v1, k = 5)
      .select(lit(1L).as("leg"), col("query_id"), col("rn"),
        col("neighbor_id"), round(col("sim"), 4).as("sim"))
    val leg2 = latest.agg(
        count(lit(1)).as("rn"),
        (sum(col("vec_id")) + sum(size(col("embedding")).cast("long")))
          .as("neighbor_id"))
      .select(lit(2L).as("leg"), lit(-1L).as("query_id"), col("rn"),
        col("neighbor_id"), lit(0.0).as("sim"))
    leg1.unionAll(leg2).orderBy("leg", "query_id", "rn")
  }

  /** INCREMENTAL AGGREGATE MAINTENANCE from the change feed (q244) —
    * the use case the feed exists for: a downstream per-source
    * aggregate is materialized once at v1, then MAINTAINED by applying
    * each commit's signed delta (insert/update_postimage count +1,
    * delete/update_preimage count −1) instead of recomputing from the
    * table. The output is the MAINTAINED aggregate; the oracle is the
    * DIRECT aggregate of the latest version — a hash match proves
    * apply-the-delta ≡ recompute, which at 100 TB is the difference
    * between touching the commit's delta and rescanning the corpus. */
  def changeFeedIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-snapinc").toString
    val st = graft.io.SnapshotTable
    st.enableChangeFeed(t)
    st.commit(s, docs, t)                                      // v1
    st.delete(s, t, col("doc_id") % 9 === 2)                   // v2
    val src = docs.where(col("doc_id") % 6 === 0)
      .withColumn("n_chars", col("n_chars") + 500L)
      .unionByName(docs.where(col("doc_id") < 8)
        .withColumn("doc_id", col("doc_id") + 100000000L))
    st.merge(s, t, src, Seq("doc_id"))                         // v3
    val base = s.read.format("graft.sources.SnapshotSource")
      .option("versionAsOf", 1).load(t)
      .groupBy("source")
      .agg(count(lit(1)).as("n0"), sum(col("n_chars")).as("sc0"))
    val delta = st.readChangeFeed(s, t, 2)
      .withColumn("sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .groupBy("source")
      .agg(sum(col("sign")).as("dn"),
        sum(col("sign") * col("n_chars")).as("dsc"))
    base.join(delta, Seq("source"), "left")
      .select(col("source"),
        (col("n0") + coalesce(col("dn"), lit(0L))).as("n_docs"),
        (col("sc0") + coalesce(col("dsc"), lit(0L))).as("sum_chars"))
      .orderBy("source")
  }

  /** NULL-COUNT manifest stats (q243): per-file null counts ride the
    * same single commit-time metadata pass as min/max, so `IS NULL`
    * prunes to the files recording nulls and `IS NOT NULL` drops
    * all-null files — Iceberg's null_value_counts tier. The corpus is
    * range-clustered on the residue that decides nullability, so the
    * null rows are file-localized and both predicates actually skip
    * files (the spec pins the partition counts; this query pins the
    * answers). Bonus: Spark pushes an `IsNotNull` beside every
    * comparison, so ordinary range queries shed all-null files for
    * free. */
  def snapshotNullStats(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .withColumn("opt_val",
        when(col("doc_id") % 10 < 5, col("n_chars"))
          .otherwise(lit(null).cast("long")))
    val t = Files.createTempDirectory("graft-snapnull").toString
    val st = graft.io.SnapshotTable
    st.commitMultiStats(s,
      docs.repartitionByRange(4, col("doc_id") % 10), t,
      statsCols = Seq("doc_id", "opt_val"))
    val tdf = s.read.format("graft.sources.SnapshotSource").load(t)
    def leg(n: Int, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("doc_id")), lit(0L)).as("sum_id"),
          coalesce(sum(col("opt_val")), lit(0L)).as("sum_opt"))
        .select(lit(n.toLong).as("leg"), col("n_docs"), col("sum_id"),
          col("sum_opt"))
    leg(1, tdf)
      .unionAll(leg(2, tdf.where(col("opt_val").isNotNull)))
      .unionAll(leg(3, tdf.where(col("opt_val").isNull)))
      .orderBy("leg")
  }

  /** CHANGE-DATA-FEED (q242): the row-level change stream of a
    * snapshot table's history — v1 appends the corpus, v2 CoW-deletes
    * a residue class, v3 MERGEs an update batch (which also
    * re-inserts keys the delete removed and inserts brand-new ones) —
    * read back with [[graft.io.SnapshotTable.readChangeFeed]] and
    * aggregated per (version, change type). The oracle recomputes
    * every leg as plain slice arithmetic over the source table, i.e.
    * a direct version-diff: any drift in what the DML sidecars record
    * (pre vs post images, insert classification, delete scope) moves
    * a count or a sum and hash-mismatches. At 100 TB the feed is what
    * turns downstream refreshes from full recomputes into
    * apply-the-delta. */
  def snapshotChangeFeed(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-snapcdf").toString
    val st = graft.io.SnapshotTable
    st.enableChangeFeed(t)
    st.commit(s, docs, t)                                       // v1
    st.delete(s, t, col("doc_id") % 10 === 3)                   // v2
    val src = docs.where(col("doc_id") % 7 === 0)
      .withColumn("n_chars", col("n_chars") + 1000L)
      .unionByName(docs.where(col("doc_id") < 5)
        .withColumn("doc_id", col("doc_id") + 100000000L))
    st.merge(s, t, src, Seq("doc_id"))                          // v3
    st.readChangeFeed(s, t, 1)
      .groupBy(col("_commit_version").as("commit_version"),
        col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("doc_id")).as("sum_id"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("commit_version", "change_type")
  }

  /** STORAGE-PARTITIONED JOIN (q240): two snapshot tables partitioned
    * on `source` — the document corpus and a one-row-per-source
    * dimension — join and aggregate on the partition key with ZERO
    * shuffle exchanges: both scans report `KeyGroupedPartitioning`
    * from manifest bytes ([[graft.sources.SnapshotScan
    * .outputPartitioning]]), so Spark plans the sort-merge join
    * exchange-free and the post-join groupBy reuses the same
    * clustering (the spec pins the no-Exchange plan; the `merge` hint
    * keeps the bench exercising the SPJ path instead of broadcasting
    * the small dimension). At 100 TB this deletes the shuffle of BOTH
    * sides of every co-partitioned fact⋈fact join — the single
    * largest cost in a partitioned-lakehouse join pipeline. */
  /** PARTITION-SPEC EVOLUTION (q241): v1 commits half the corpus
    * UNPARTITIONED, v2 declares `PARTITIONED BY (source)` via
    * `evolveSpec` and appends the other half — old files keep UNKNOWN
    * tuples (they survive every partition prune; the residual row
    * filter keeps answers exact), new files prune exactly, and no old
    * byte is rewritten (the point of spec evolution at 100 TB). Legs:
    * (1) the full read across the spec boundary, (2) a
    * partition-pruned read that must still see the pre-evolution rows
    * of that value, (3) the pre-evolution version time-traveled with
    * its own spec-free manifest. */
  def snapshotSpecEvolution(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-snapevo").toString
    val st = graft.io.SnapshotTable
    st.commit(s, docs.where(col("doc_id") % 2 === 0), t)
    st.commitPartitioned(s, docs.where(col("doc_id") % 2 === 1), t,
      Seq("source"), evolveSpec = true)
    def agg(leg: Int, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("doc_id")), lit(0L)).as("sum_id"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
        .select(lit(leg.toLong).as("leg"), col("n_docs"), col("sum_id"),
          col("sum_chars"))
    val full = s.read.format("graft.sources.SnapshotSource").load(t)
    val leg1 = agg(1, full)
    val leg2 = agg(2, full.where(col("source") === "src3"))
    val leg3 = agg(3, s.read.format("graft.sources.SnapshotSource")
      .option("versionAsOf", 1).load(t))
    leg1.unionAll(leg2).unionAll(leg3).orderBy("leg")
  }

  def snapshotSpjJoin(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val dim = docs.groupBy("source")
      .agg(min(col("doc_id")).as("src_min"),
        count(lit(1)).as("src_docs"))
    val tA = Files.createTempDirectory("graft-spja").toString
    val tB = Files.createTempDirectory("graft-spjb").toString
    val st = graft.io.SnapshotTable
    st.commitPartitioned(s, docs, tA, Seq("source"))
    st.commitPartitioned(s, dim, tB, Seq("source"))
    val a = s.read.format("graft.sources.SnapshotSource").load(tA)
    val b = s.read.format("graft.sources.SnapshotSource").load(tB)
    a.hint("merge").join(b, "source")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") > col("src_min"), 1L).otherwise(0L))
          .as("n_after_min"),
        (sum(col("n_chars")) + max(col("src_docs"))).as("checksum"))
      .orderBy("source")
  }

  /** SQL UPDATE + MERGE INTO through the catalog (q232,
    * [[graft.sources.SnapshotRowLevelOperation]]): the last two
    * lakehouse DML verbs that previously existed only as API calls
    * (q158/q159) now lower from PLAIN SQL through Spark's row-level
    * operation machinery — a group-based copy-on-write rewrite
    * published as one commit, with every pre-DML version still
    * time-travelable. An UPDATE bumps one residue class, then a MERGE
    * updates the matched slice and inserts brand-new keys; legs read
    * each version's aggregates back through `VERSION AS OF`, so the
    * oracle is pure CASE arithmetic over the source table. The rewrite
    * reads and replaces ONLY the touched file groups — Spark's runtime
    * group filter collects the condition's `_file` values, the scan
    * narrows to them, and the commit carries every untouched file by
    * reference (the API DML tier's touched-files contract, asserted
    * file-level in SnapshotCatalogSpec). */
  def snapshotSqlDml(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .createOrReplaceTempView("q232_src")
    s.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.SnapshotCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.root", catalogRoot)
    val name = "t_" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(12)
    s.sql(s"CREATE TABLE graft_cat.$name " +
      "(doc_id BIGINT, source STRING, n_chars BIGINT)")
    try {
      s.sql(s"INSERT INTO graft_cat.$name SELECT * FROM q232_src")
      s.sql(s"UPDATE graft_cat.$name SET n_chars = n_chars + 1000 " +
        "WHERE doc_id % 3 = 0")
      s.sql(s"""MERGE INTO graft_cat.$name t USING (
          SELECT doc_id, source, n_chars FROM q232_src
          WHERE doc_id % 5 = 0
          UNION ALL
          SELECT doc_id + 100000000, source, n_chars FROM q232_src
          WHERE doc_id % 7 = 0) s
        ON t.doc_id = s.doc_id
        WHEN MATCHED THEN UPDATE SET t.n_chars = s.n_chars * 10
        WHEN NOT MATCHED THEN INSERT (doc_id, source, n_chars)
          VALUES (s.doc_id, s.source, s.n_chars)""")
      val legs = (2 to 4).map { v =>
        s.sql(s"""SELECT $v AS leg, count(*) AS n_docs,
          coalesce(sum(doc_id), 0) AS sum_id,
          coalesce(sum(n_chars), 0) AS sum_chars
          FROM graft_cat.$name VERSION AS OF $v""")
      }
      legs.reduce(_.unionAll(_)).orderBy("leg")
        .localCheckpoint() // materialize before the table drops
    } finally s.sql(s"DROP TABLE graft_cat.$name")
  }

  /** SQL-path CHANGE-DATA-FEED (q245,
    * [[graft.sources.SnapshotReplaceGroupsWrite]]): the headline SQL
    * DML verbs (q232) and the change feed (q242) compose — SQL
    * UPDATE/MERGE versions now record sidecars derived at commit as
    * the net multiset diff of scanned-vs-staged rows, so a downstream
    * incremental consumer works whichever tier issued the DML. The
    * lifecycle: INSERT (v2 appends feed as inserts), an UPDATE whose
    * predicate references the ASSIGNED column (the postimage trap —
    * it must be evaluated on pre-assignment values), a MERGE mixing
    * matched updates and brand-new inserts (feeds the net delta as
    * delete/insert — the ON keys never reach the write, so pre/post
    * pairing is the API tier's job), and a MERGE WHEN MATCHED THEN
    * DELETE. The oracle replays every leg as slice arithmetic over
    * the source table; any drift in what the sidecars record moves a
    * count or a sum and hash-mismatches. */
  def snapshotSqlDmlChangeFeed(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .createOrReplaceTempView("q245_src")
    s.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.SnapshotCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.root", catalogRoot)
    val name = "t_" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(12)
    s.sql(s"CREATE TABLE graft_cat.$name " +
      "(doc_id BIGINT, source STRING, n_chars BIGINT)")   // v1 (empty)
    graft.io.SnapshotTable.enableChangeFeed(s"$catalogRoot/$name")
    try {
      s.sql(s"INSERT INTO graft_cat.$name SELECT * FROM q245_src") // v2
      s.sql(s"UPDATE graft_cat.$name SET n_chars = 77777 " +
        "WHERE n_chars % 10 = 3")                                  // v3
      s.sql(s"""MERGE INTO graft_cat.$name t USING (
          SELECT doc_id, source, n_chars FROM q245_src
          WHERE doc_id % 5 = 0
          UNION ALL
          SELECT doc_id + 100000000, source, n_chars FROM q245_src
          WHERE doc_id % 7 = 0) s
        ON t.doc_id = s.doc_id
        WHEN MATCHED THEN UPDATE SET t.n_chars = s.n_chars * 10 + 3
        WHEN NOT MATCHED THEN INSERT (doc_id, source, n_chars)
          VALUES (s.doc_id, s.source, s.n_chars)""")               // v4
      s.sql(s"""MERGE INTO graft_cat.$name t USING (
          SELECT doc_id FROM q245_src WHERE doc_id % 11 = 0) s
        ON t.doc_id = s.doc_id
        WHEN MATCHED THEN DELETE""")                               // v5
      graft.io.SnapshotTable
        .readChangeFeed(s, s"$catalogRoot/$name", 2)
        .groupBy(col("_commit_version").as("commit_version"),
          col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_id"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("commit_version", "change_type")
        .localCheckpoint() // materialize before the table drops
    } finally s.sql(s"DROP TABLE graft_cat.$name")
  }

  /** MERGE-ON-READ DML (q246, [[graft.io.SnapshotTable
    * .enableMergeOnRead]]): the DML tier that makes point mutations
    * affordable at 100 TB — copy-on-write rewrites every touched file
    * in full, merge-on-read instead commits a positional-delete
    * sidecar ((file, pos) rows) that scans anti-join on only the
    * dirty files, and UPDATE/MERGE append just the CHANGED rows. The
    * lifecycle: v1 commits the corpus, v2 tombstones a residue class
    * (ZERO data files rewritten), v3 updates a slice (tombstone +
    * appended rebuilt rows), v4 merges a batch that updates matched
    * keys, RE-INSERTS keys v2 tombstoned, and inserts brand-new ids.
    * Legs read each version's aggregates back through time travel —
    * the oracle is pure slice arithmetic, so any tombstone the scan
    * fails to apply (or over-applies) moves a sum. */
  def morDml(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-mordml").toString
    val st = graft.io.SnapshotTable
    st.enableMergeOnRead(t)
    st.commit(s, docs, t)                                        // v1
    st.delete(s, t, col("doc_id") % 10 === 3)                    // v2
    st.update(s, t, col("n_chars") % 7 === 2,
      Map("n_chars" -> lit(55555L)))                             // v3
    val src = docs.where(col("doc_id") % 6 === 0)
      .withColumn("n_chars", col("n_chars") + 100L)
      .unionByName(docs.where(col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + 100000000L))
    st.merge(s, t, src, Seq("doc_id"))                           // v4
    (1 to 4).map { v =>
      st.readSnapshot(s, t, Some(v))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_id"),
          sum(col("n_chars")).as("sum_chars"))
        .select(lit(v.toLong).as("leg"), col("n_docs"), col("sum_id"),
          col("sum_chars"))
    }.reduce(_.unionAll(_)).orderBy("leg")
  }

  /** MERGE-ON-READ through the DSv2 source + compaction folding
    * (q247): a tombstoned table read through the SQL-reachable scan —
    * dirty files take the position-filtered row path, clean files
    * keep the vectorized/split path, `count(*)` still answers from
    * MANIFEST BYTES (physical rows − live tombstones, a LocalTableScan
    * plan) — then OPTIMIZE folds the deletes into clean files and the
    * same aggregates re-read IDENTICALLY (legs 2 and 3 must hash
    * equal): merge-on-read is a write-side layout choice, never a
    * semantics change. */
  def morDsv2(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-mords").toString
    val st = graft.io.SnapshotTable
    st.enableMergeOnRead(t)
    st.commitMultiStats(s, docs, t, statsCols = Seq("doc_id"))
    st.delete(s, t, col("doc_id") % 5 === 2)
    def legs(leg1: Int, leg2: Int): DataFrame = {
      val ds = s.read.format("graft.sources.SnapshotSource").load(t)
      val c = ds.groupBy().count()
        .select(lit(leg1.toLong).as("leg"), col("count").as("n_docs"),
          lit(0L).as("sum_id"), lit(0L).as("sum_chars"))
      val a = ds.where(col("n_chars") % 3 === 1)
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_id"),
          sum(col("n_chars")).as("sum_chars"))
        .select(lit(leg2.toLong).as("leg"), col("n_docs"), col("sum_id"),
          col("sum_chars"))
      c.unionAll(a)
    }
    val pre = legs(1, 2)
    val preRows = pre.collect() // materialize before compaction
    st.compact(s, t, numFiles = 4)
    val preDf = s.createDataFrame(
      s.sparkContext.parallelize(preRows.toSeq, 1), pre.schema)
    preDf.unionAll(legs(3, 4)).orderBy("leg")
  }

  /** TARGETED partition-spec repair (q248,
    * [[graft.io.SnapshotTable.repairPartitionSpec]]): after q241's
    * evolution the pre-evolution files carry UNKNOWN tuples — repair
    * rewrites ONLY that slice into value-pure files with exact
    * re-derived tuples (known files carry by identity, content never
    * changes). Legs: (1) the full read after repair, (2) a
    * partition-pruned read that is now FILE-EXACT over the whole
    * table — a misfiled tuple moves its counts, (3) the pre-repair
    * version time-traveled (content identity across the repair). */
  def specRepair(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-repair").toString
    val st = graft.io.SnapshotTable
    st.commit(s, docs.where(col("doc_id") % 2 === 0), t)
    st.commitPartitioned(s, docs.where(col("doc_id") % 2 === 1), t,
      Seq("source"), evolveSpec = true)
    require(st.repairPartitionSpec(s, t, numFiles = 2).contains(3),
      "repair found nothing to rewrite")
    def agg(leg: Int, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("doc_id")), lit(0L)).as("sum_id"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
        .select(lit(leg.toLong).as("leg"), col("n_docs"), col("sum_id"),
          col("sum_chars"))
    agg(1, st.readSnapshot(s, t))
      .unionAll(agg(2, st.readSnapshotPartitioned(s, t,
        Map("source" -> "src3"))))
      .unionAll(agg(3, st.readSnapshot(s, t, Some(2))))
      .orderBy("leg")
  }

  /** COLUMN-ID RENAME without rewrite (q249,
    * [[graft.io.SnapshotTable.renameColumn]] — Iceberg's field-id
    * rename flattened onto add-only evolution: a column's schema
    * POSITION is its stable id, so a rename is a metadata-only commit
    * that closes a name epoch; ZERO data bytes move). Lifecycle:
    * stage the even-id docs with min/max stats on `n_chars`, rename
    * it to `len`, append the odd-id docs under the NEW name (mixed
    * epochs from here on — old files physically store `n_chars`, new
    * files `len`), then CoW-delete a residue class BY the new name
    * across both epochs. Legs, all through the DSv2 source:
    * (1) full pre-DML read under the new name (per-file physical-name
    * remap in the vectorized reader), (2) a stats-bounded slice on
    * `len` — the manifest's renamed stats tier prunes files written
    * under EITHER name, (3) the post-delete table, (4) the v1
    * time-traveled read, which keeps its own epoch's name
    * (`n_chars`, aliased for the oracle). */
  def snapshotRename(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-rename").toString
    val st = graft.io.SnapshotTable
    st.commitMultiStats(s, docs.where(col("doc_id") % 2 === 0)
      .repartition(4), t, statsCols = Seq("n_chars"))          // v1
    require(st.renameColumn(t, "n_chars", "len") == 2, "rename != v2")
    st.commitMultiStats(s, docs.where(col("doc_id") % 2 === 1)
      .withColumnRenamed("n_chars", "len")
      .repartition(4), t, statsCols = Seq("len"))              // v3
    def load(asOf: Option[Int]) = {
      val r = s.read.format("graft.sources.SnapshotSource")
      asOf.fold(r)(v => r.option("versionAsOf", v.toString)).load(t)
    }
    def agg(leg: Int, df: DataFrame, valueCol: String) =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("doc_id")), lit(0L)).as("sum_id"),
          coalesce(sum(col(valueCol)), lit(0L)).as("sum_len"))
        .select(lit(leg.toLong).as("leg"), col("n_docs"), col("sum_id"),
          col("sum_len"))
    val leg1 = agg(1, load(Some(3)), "len")
    val leg2 = agg(2, load(Some(3)).where(col("len") <= 500L), "len")
    st.delete(s, t, pmod(col("len"), lit(7L)) === 3)           // v4
    val leg3 = agg(3, load(None), "len")
    val leg4 = agg(4, load(Some(1)), "n_chars")
    leg1.unionAll(leg2).unionAll(leg3).unionAll(leg4).orderBy("leg")
  }

  /** HIDDEN PARTITIONING (q250, Iceberg partition transforms —
    * [[graft.io.SnapshotTable.commitPartitionedTransforms]]): the
    * events stream lands day-partitioned by a TRANSFORM of its raw
    * `ts` (no hand-maintained date column — the failure mode hidden
    * partitioning exists to kill: a 100 TB table where analysts must
    * remember to filter the derived column), and a second table
    * bucket-partitions by `user_id` through the portable hash. Legs,
    * all DSv2 reads: (1) the full day-partitioned table, (2) a raw
    * `ts >=` range — the scan plans only the matching day cells
    * (plan-asserted in SnapshotSourceSpec; here the oracle pins
    * row-exactness), (3) a point-user probe on the bucketed table —
    * one cell's files plan, the residual keeps it row-exact, (4) the
    * table after `deletePartitions` drops one day CELL — "delete the
    * bad day" as one metadata commit, zero data IO. */
  def hiddenPartitioning(s: SparkSession, dir: String): DataFrame = {
    import graft.io.PartTransform
    val ev = table(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"))
    val tA = Files.createTempDirectory("graft-hidA").toString
    val tB = Files.createTempDirectory("graft-hidB").toString
    val st = graft.io.SnapshotTable
    st.commitPartitionedTransforms(s, ev, tA,
      Seq(PartTransform.DateUnit("ts", "day")))
    st.commitPartitionedTransforms(s, ev, tB,
      Seq(PartTransform.Bucket("user_id", 8)))
    // legs pin their VERSION explicitly: the delete below runs at
    // build time, the legs execute later — an unpinned read would see
    // the post-delete table
    def load(t: String, v: Int) =
      s.read.format("graft.sources.SnapshotSource")
        .option("versionAsOf", v.toString).load(t)
    def agg(leg: Int, df: DataFrame) =
      df.agg(count(lit(1)).as("n_events"),
          coalesce(sum(col("event_id")), lit(0L)).as("sum_id"),
          coalesce(sum(col("user_id")), lit(0L)).as("sum_user"))
        .select(lit(leg.toLong).as("leg"), col("n_events"),
          col("sum_id"), col("sum_user"))
    val cutoff = java.sql.Timestamp.valueOf("2024-01-20 12:00:00")
    val probe = ev.agg(min(col("user_id"))).head().getLong(0)
    val leg1 = agg(1, load(tA, 1))
    val leg2 = agg(2, load(tA, 1).where(col("ts") >= lit(cutoff)))
    val leg3 = agg(3, load(tB, 1).where(col("user_id") === probe))
    st.deletePartitions(tA, Map("ts" -> "2024-01-05"))
    val leg4 = agg(4, load(tA, 2))
    leg1.unionAll(leg2).unionAll(leg3).unionAll(leg4).orderBy("leg")
  }

  /** NAMED TAGS + SMALL-FILE BINPACK (q251,
    * [[graft.io.SnapshotTable.tag]] /
    * [[graft.io.SnapshotTable.compactSmall]]): the reproducibility +
    * maintenance pair a 100-TB training pipeline runs daily. The
    * even-id docs land as v1 and get TAGGED `base` (the frozen
    * training snapshot); the odd ids drip in as three small appends
    * (the streaming-tail shape); `compactSmall` binpacks ONLY the
    * small files — the adequately-sized v1 files carry by reference
    * (identity-carry is spec-pinned; here the oracle pins content
    * neutrality); then VACUUM keeps just one version by count, and
    * the tagged v1 SURVIVES it — leg 3 re-reads the tag after
    * retention would have eaten it. */
  def snapshotTagsBinpack(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t = Files.createTempDirectory("graft-tags").toString
    val st = graft.io.SnapshotTable
    st.commit(s, docs.where(col("doc_id") % 2 === 0).coalesce(2), t)
    require(st.tag(t, "base") == 1, "tag != v1")
    (0 to 2).foreach(r => st.commit(s,
      docs.where(col("doc_id") % 2 === 1 &&
        pmod(col("doc_id"), lit(3L)) === r).coalesce(1), t))
    val sizes = st.manifestFiles(t, 4).zip(st.readSizes(t, 4).get)
    val smallMax = sizes.map(_._2).sorted.take(3).max
    require(st.compactSmall(s, t, smallMax + 1).contains(5),
      "binpack did not commit")
    def agg(leg: Int, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("doc_id")), lit(0L)).as("sum_id"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
        .select(lit(leg.toLong).as("leg"), col("n_docs"), col("sum_id"),
          col("sum_chars"))
    def tagRead() = s.read.format("graft.sources.SnapshotSource")
      .option("tagAsOf", "base").load(t)
    val leg1 = agg(1, tagRead()).localCheckpoint()
    val leg2 = agg(2, st.readSnapshot(s, t, Some(5))).localCheckpoint()
    st.vacuum(t, 1) // keeps v5 by count — and v1 ONLY via the tag
    require(st.versions(t) == Seq(1, 5), s"vacuum kept ${st.versions(t)}")
    val leg3 = agg(3, tagRead())
    leg1.unionAll(leg2).unionAll(leg3).orderBy("leg")
  }

  /** Table history + OPTIMIZE through CALL (q234,
    * [[graft.io.SnapshotTable.history]] /
    * [[graft.sources.SnapshotCatalog]] `history`/`compact`
    * procedures): the audit-trail verb (`DESCRIBE HISTORY`) answered
    * from MANIFEST BYTES alone — version, commit kind, wall-clock, and
    * the recorded row count per retained version, newest first, zero
    * data IO. The staged lifecycle: CREATE (empty v1), two appends, a
    * `CALL compact(num_files => 2)` OPTIMIZE (an overwrite commit —
    * layout changes, content never), and a CoW DELETE; the history
    * rows pin each version's action, injected wall-clock, and row
    * count (file counts are layout-dependent and stay out of the
    * oracle). */
  def snapshotHistory(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    s.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.SnapshotCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.root", catalogRoot)
    val name = "t_" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(12)
    val t = s"$catalogRoot/$name"
    val st = graft.io.SnapshotTable
    val base = 1_000_000_000_000L
    locally {
      var tick = 0L
      st.clock.withValue(() => { tick += 1; base + tick * 60_000L }) {
        s.sql(s"CREATE TABLE graft_cat.$name " +
          "(doc_id BIGINT, source STRING, n_chars BIGINT)")
        st.commit(s, docs.where(pmod(col("doc_id"), lit(2L)) === 0), t)
        st.commit(s, docs.where(pmod(col("doc_id"), lit(2L)) === 1), t)
        s.sql(s"CALL graft_cat.compact(`table` => '$name', " +
          "num_files => 2)").collect()
        s.sql(s"DELETE FROM graft_cat.$name WHERE doc_id < 100"): Unit
      }
    }
    try {
      s.sql(s"CALL graft_cat.history(`table` => '$name')")
        .select(col("version"), col("action"), col("ts_millis"),
          col("n_rows"))
        .orderBy("version")
        .localCheckpoint() // materialize before the table drops
    } finally s.sql(s"DROP TABLE graft_cat.$name")
  }

  /** Per-language profile of the pre-DML version and the latest version,
    * both read from the same log — the DML is a commit, not a mutation. */
  private def dmlProfile(s: SparkSession, t: String, preV: Int): DataFrame = {
    def profile(df: DataFrame, phase: String): DataFrame =
      df.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .select(lit(phase).as("phase"), col("lang"), col("n_docs"),
          col("sum_chars"))
    profile(graft.io.SnapshotTable.readSnapshot(s, t, Some(preV)), "before")
      .unionAll(profile(graft.io.SnapshotTable.readSnapshot(s, t), "after"))
      .orderBy("phase", "lang")
  }
}
