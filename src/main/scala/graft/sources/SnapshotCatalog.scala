package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.SnapshotTable

/** TableCatalog over a directory of snapshot tables — the hook that
  * gives plain SQL the FULL lakehouse lifecycle with no API calls, the
  * way Delta/Iceberg users actually operate:
  *
  * {{{
  *   spark.sql.catalog.graft_cat      = graft.sources.SnapshotCatalog
  *   spark.sql.catalog.graft_cat.root = /data/tables
  *
  *   CREATE TABLE graft_cat.events (id BIGINT, src STRING)
  *   INSERT INTO graft_cat.events SELECT ...          -- append commit
  *   INSERT OVERWRITE graft_cat.events SELECT ...     -- overwrite commit
  *   DELETE FROM graft_cat.events WHERE id < 100      -- CoW delete commit
  *   UPDATE graft_cat.events SET src = ... WHERE ...  -- row-level CoW
  *   MERGE INTO graft_cat.events t USING s ON ...     -- row-level CoW
  *   ALTER TABLE graft_cat.events ADD COLUMN lang STRING -- metadata-only
  *   SELECT * FROM graft_cat.events VERSION AS OF 2   -- time travel
  * }}}
  *
  * A table IS a directory `root/<ns...>/<name>` holding the snapshot
  * log; the catalog is STATELESS — every lookup reads the log, so
  * external writers through [[graft.io.SnapshotTable]] or the DSv2
  * path-based source are immediately visible (the log is the single
  * source of truth, never a catalog cache). All directory operations
  * (list, create, drop, rename) go through the Hadoop `FileSystem`
  * resolved from the root, so the same catalog works on `file:`, HDFS,
  * or an object store. CREATE TABLE publishes an empty schema-bearing
  * v1 (the table is readable before its first INSERT); DELETE arrives
  * through [[SnapshotDsTable]]'s SupportsDelete and lowers to the
  * copy-on-write [[SnapshotTable.delete]] — only touched files
  * rewrite, prior versions stay time-travelable. `ALTER TABLE ADD
  * COLUMN` lowers to a schema-evolving EMPTY append commit through the
  * same add-column-only protocol writes use — a metadata-only commit,
  * no file rewritten, and `VERSION AS OF` across the evolution reads
  * each version with the schema it had then; every other ALTER verb
  * still refuses (drop/rename/retype silently corrupt readers of old
  * files). `VERSION AS OF` resolves through `loadTable(ident,
  * version)`; `TIMESTAMP AS OF` through `loadTable(ident, timestamp)`
  * against the commit wall-clock every manifest records
  * ([[SnapshotTable.resolveTimestamp]]: latest version at-or-before t;
  * pre-first-commit timestamps refuse loudly). Retention is the
  * `vacuum` PROCEDURE (Spark 4's ProcedureCatalog CALL surface):
  *
  * {{{
  *   CALL graft_cat.vacuum(`table` => 'events', keep => 3)
  *   CALL graft_cat.vacuum(`table` => 'events', older_than_ms => t)
  * }}}
  *
  * returning (deleted_files, oldest_retained) — see
  * [[SnapshotTable.vacuum]] for the retention guard (time travel
  * inside the horizon never breaks; readers below it fail loudly).
  * Rollback is the `restore` procedure — `CALL
  * graft_cat.restore(table => 'events', version => v)` publishes a
  * metadata-only commit with version v's exact content
  * ([[SnapshotTable.restore]]).
  */
class SnapshotCatalog extends TableCatalog with ProcedureCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root"))
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String = {
    val parts = ident.namespace().toSeq :+ ident.name()
    parts.foreach(p => require(p.matches("[A-Za-z0-9_.-]+") &&
      p != "." && p != "..",
      s"illegal table-path segment '$p'"))
    (root +: parts).mkString("/")
  }

  override def tableExists(ident: Identifier): Boolean =
    SnapshotTable.versions(dirOf(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = new Path((root +: namespace.toSeq).mkString("/"))
    val fs = SnapshotSource.fs(base.toString)
    if (!fs.exists(base)) Array.empty
    else fs.listStatus(base)
      .filter(st => st.isDirectory &&
        SnapshotTable.versions(new Path(base, st.getPath.getName).toString)
          .nonEmpty)
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  private def table(ident: Identifier, asOf: Option[Int]): Table = {
    val dir = dirOf(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = SnapshotTable.resolveVersion(dir, asOf)
    val schema = SnapshotTable.readSchema(dir, v).getOrElse(
      SnapshotSource.footerSchema(
        s"$dir/${SnapshotTable.manifestFiles(dir, v).head}"))
    new SnapshotDsTable(schema,
      Map("path" -> dir) ++ asOf.map(a => "versionAsOf" -> a.toString))
  }

  override def loadTable(ident: Identifier): Table = table(ident, None)

  /** `VERSION AS OF <v>` — the SQL spelling of time travel. */
  override def loadTable(ident: Identifier, version: String): Table =
    table(ident, Some(version.toInt))

  /** `TIMESTAMP AS OF <t>` — `timestamp` arrives in MICROseconds (the
    * TableCatalog contract); manifests record millis. Floor division is
    * exact for the at-or-before contract: a commit at m millis is
    * visible to a query at t micros iff m*1000 <= t iff m <= t/1000. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    table(ident,
      Some(SnapshotTable.resolveTimestamp(dir,
        Math.floorDiv(timestamp, 1000L))))
  }

  /** Stage one zero-row schema-bearing parquet file under `dir` and
    * append-commit it — the shared shape of CREATE TABLE (publishes an
    * empty readable v1) and ALTER ADD COLUMN (publishes a
    * schema-evolving empty version): the parquet writer creates parent
    * directories through the FS, and [[SnapshotTable.commitStagedFiles]]
    * evolves/validates the schema under the add-column-only rule. A
    * partitioned CREATE records the columns in v1 (the anchor file's
    * tuple is all-NULL — it holds nothing), so every later INSERT
    * inherits the declared layout through the write builder. */
  private def commitEmpty(dir: String, schema: StructType,
                          sub: String, partCols: Seq[String] = Nil): Unit = {
    val rel = s"$sub/part-empty.parquet"
    new ParquetGroupWriter(s"$dir/$rel", schema, Array.empty).close()
    val parts =
      if (partCols.isEmpty) None
      else Some((partCols, Seq(Seq.fill(partCols.length)(
        None: Option[String]))))
    SnapshotTable.commitStagedFiles(dir, Seq(rel), schema,
      parts = parts): Unit
  }

  /** `CREATE TABLE ... PARTITIONED BY (c, ...)` — IDENTITY transforms
    * only (the snapshot tier's hive-style partitioning; bucket/days/
    * hours transforms refuse loudly): the declared columns land in the
    * empty v1 manifest and every subsequent `INSERT INTO` inherits the
    * layout — the full SQL story (CREATE PARTITIONED BY → INSERT →
    * pruned SELECT → metadata-only partition DELETE) with no API
    * calls. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val partCols: Seq[String] = partitions.toSeq.map { t =>
      require(t.name() == "identity" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1,
        s"snapshot tables partition by IDENTITY column transforms " +
          s"only, got $t")
      t.references()(0).fieldNames()(0)
    }
    if (partCols.nonEmpty)
      SnapshotTable.validatePartCols(schema, partCols)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    commitEmpty(dirOf(ident), schema, "data/w_create", partCols)
    table(ident, None)
  }

  /** `ALTER TABLE ... ADD COLUMN(S)` lowers to a schema-evolving empty
    * append commit — the add-column-only evolution the write protocol
    * already guarantees, surfaced as the SQL lifecycle verb: no data
    * file is touched, older files null-fill the new columns at read
    * time, and history keeps its pre-ALTER schema (time travel across
    * the evolution reads each version as it was). Only top-level
    * nullable adds are accepted; anything else (drop, rename, retype,
    * nested paths) refuses loudly — those rewrite meaning, not just
    * metadata. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    // ALTER TABLE ... RENAME COLUMN: the metadata-only field-id rename
    // ([[graft.io.SnapshotTable.renameColumn]] — zero data bytes
    // rewritten, old files read and prune under the new name)
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    if (renames.nonEmpty) {
      require(renames.length == changes.length,
        "ALTER TABLE: mixing RENAME COLUMN with other changes in one " +
          "statement is not supported")
      renames.foreach { r =>
        require(r.fieldNames().length == 1,
          "ALTER TABLE RENAME COLUMN: snapshot tables hold flat " +
            s"columns (got nested path ${r.fieldNames().mkString(".")})")
        SnapshotTable.renameColumn(dir, r.fieldNames().head, r.newName())
      }
      return table(ident, None)
    }
    val added = changes.map {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "ALTER TABLE ADD COLUMN: snapshot tables hold flat columns " +
            s"(got nested path ${add.fieldNames().mkString(".")})")
        require(add.position() == null,
          "ALTER TABLE ADD COLUMN ... FIRST/AFTER: evolved columns " +
            "APPEND to the schema (older files null-fill by position-" +
            "independent name lookup; honoring a position would lie " +
            "about it)")
        StructField(add.fieldNames().head, add.dataType(), nullable = true)
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE ${other.getClass.getSimpleName}: the snapshot " +
          "commit contract evolves schemas by ADDING columns only")
    }
    val base = SnapshotTable.readSchema(dir,
      SnapshotTable.resolveVersion(dir)).getOrElse(
      throw new IllegalStateException(
        s"ALTER TABLE on a pre-schema legacy log at $dir"))
    val dup = added.map(_.name).find(n => base.fieldNames.contains(n))
    require(dup.isEmpty, s"ALTER TABLE ADD COLUMN: '${dup.get}' exists")
    // a partitioned table's evolving empty append declares the SAME
    // partitioning (the append protocol); the anchor's tuple is NULL
    commitEmpty(dir, StructType(base.fields ++ added),
      s"data/w_alter${SnapshotTable.versions(dir).last + 1}",
      SnapshotTable.partitionColumns(dir,
        SnapshotTable.resolveVersion(dir)))
    table(ident, None)
  }

  /** DROP recursively deletes the table directory — guarded by
    * [[tableExists]] so a directory under the root that is NOT a
    * snapshot table (no log) is never deleted by a mistyped name. */
  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && {
      val p = new Path(dirOf(ident))
      SnapshotSource.fs(p.toString).delete(p, true)
    }

  /** RENAME via `FileSystem.rename`. NOTE on atomicity: rename is
    * atomic on HDFS and single-filesystem POSIX paths, but NOT across
    * filesystems, and object stores implement it as copy+delete — a
    * production catalog on S3 keeps a name→location indirection
    * instead of moving data (the Iceberg catalog design); this rename
    * is the single-FS convenience verb. */
  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    val src = new Path(dirOf(from))
    val dst = new Path(dirOf(to))
    val fs = SnapshotSource.fs(src.toString)
    Option(dst.getParent).foreach(p => fs.mkdirs(p))
    require(fs.rename(src, dst), s"rename $from -> $to failed")
  }

  // ---- procedures (the CALL surface) ----

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(
      Identifier.of(Array.empty, "partitions"),
      Identifier.of(Array.empty, "vacuum"),
      Identifier.of(Array.empty, "restore"),
      Identifier.of(Array.empty, "compact"),
      Identifier.of(Array.empty, "repair_spec"),
      Identifier.of(Array.empty, "compact_small"),
      Identifier.of(Array.empty, "tag"),
      Identifier.of(Array.empty, "remove_tag"),
      Identifier.of(Array.empty, "tags"),
      Identifier.of(Array.empty, "history"))
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().isEmpty, s"unknown procedure $ident")
    ident.name() match {
      case "vacuum" => new VacuumProcedure(this)
      case "restore" => new RestoreProcedure(this)
      case "compact" => new CompactProcedure(this)
      case "history" => new HistoryProcedure(this)
      case "partitions" => new PartitionsProcedure(this)
      case "repair_spec" => new RepairSpecProcedure(this)
      case "compact_small" => new CompactSmallProcedure(this)
      case "tag" => new TagProcedure(this)
      case "remove_tag" => new RemoveTagProcedure(this)
      case "tags" => new TagsProcedure(this)
      case other => throw new IllegalArgumentException(
        s"unknown procedure $other — this catalog exposes partitions" +
          "(table), vacuum(table, " +
          "keep [, older_than_ms]), restore(table, version), " +
          "compact(table, num_files [, stats_col]), " +
          "repair_spec(table [, num_files]), and history(table)")
    }
  }

  private[sources] def tableDir(name: String): String = {
    val parts = name.split("\\.").toSeq
    dirOf(Identifier.of(parts.init.toArray, parts.last))
  }
}

/** `CALL <cat>.vacuum(table => '...', keep => n)` — the SQL spelling of
  * snapshot retention (Spark 4 ProcedureCatalog): by version count
  * (`keep`, [[SnapshotTable.vacuum]]) or by age (`older_than_ms`,
  * [[SnapshotTable.vacuumOlderThan]] — wins when >= 0). One result row:
  * (deleted_files, oldest_retained). */
private[sources] class VacuumProcedure(cat: SnapshotCatalog)
    extends UnboundProcedure with BoundProcedure {
  import org.apache.spark.sql.types._
  override def name(): String = "vacuum"
  override def description(): String =
    "delete data files and manifests outside the retention horizon"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to the catalog root").build(),
    ProcedureParameter.in("keep", IntegerType).defaultValue("1")
      .comment("newest versions to retain (>= 1)").build(),
    ProcedureParameter.in("older_than_ms", LongType).defaultValue("-1")
      .comment("age horizon in epoch millis; wins when >= 0").build())
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = cat.tableDir(input.getUTF8String(0).toString)
    val olderThan = input.getLong(2)
    val deleted =
      if (olderThan >= 0) SnapshotTable.vacuumOlderThan(dir, olderThan)
      else SnapshotTable.vacuum(dir, input.getInt(1))
    val out: Scan = new LocalScan {
      override def readSchema(): StructType = StructType(Seq(
        StructField("deleted_files", IntegerType, nullable = false),
        StructField("oldest_retained", IntegerType, nullable = false)))
      override def rows(): Array[InternalRow] = Array(
        InternalRow(deleted.size, SnapshotTable.versions(dir).head))
    }
    java.util.List.of(out).iterator()
  }
}

/** `CALL <cat>.restore(table => '...', version => v)` — the SQL
  * spelling of [[SnapshotTable.restore]]: publish a new commit whose
  * content is exactly version `v`'s (metadata-only rollback; the bad
  * version stays in history). One result row:
  * (restored_from, new_version). */
private[sources] class RestoreProcedure(cat: SnapshotCatalog)
    extends UnboundProcedure with BoundProcedure {
  import org.apache.spark.sql.types._
  override def name(): String = "restore"
  override def description(): String =
    "commit a new version whose content is exactly an older version's"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to the catalog root").build(),
    ProcedureParameter.in("version", IntegerType)
      .comment("retained version to restore the table to").build())
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = cat.tableDir(input.getUTF8String(0).toString)
    val from = input.getInt(1)
    val next = SnapshotTable.restore(dir, from)
    val out: Scan = new LocalScan {
      override def readSchema(): StructType = StructType(Seq(
        StructField("restored_from", IntegerType, nullable = false),
        StructField("new_version", IntegerType, nullable = false)))
      override def rows(): Array[InternalRow] = Array(
        InternalRow(from, next))
    }
    java.util.List.of(out).iterator()
  }
}

/** `CALL <cat>.compact(table => '...', num_files => n [, stats_col =>
  * c])` — the SQL spelling of `OPTIMIZE` ([[SnapshotTable.compact]]):
  * rewrite the visible content to n scan-sized files as an ordinary
  * overwrite commit (layout changes, content never; history keeps the
  * pre-compaction versions until vacuum). One result row:
  * (new_version, n_files). */
private[sources] class CompactProcedure(cat: SnapshotCatalog)
    extends UnboundProcedure with BoundProcedure {
  import org.apache.spark.sql.types._
  override def name(): String = "compact"
  override def description(): String =
    "rewrite the current content to num_files files (OPTIMIZE)"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to the catalog root").build(),
    ProcedureParameter.in("num_files", IntegerType)
      .comment("target file count (>= 1)").build(),
    ProcedureParameter.in("stats_col", StringType).defaultValue("NULL")
      .comment("long column to range-partition + record stats on")
      .build())
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = cat.tableDir(input.getUTF8String(0).toString)
    val n = input.getInt(1)
    require(n >= 1, "compact needs num_files >= 1")
    val statsCol =
      if (input.isNullAt(2)) None
      else Some(input.getUTF8String(2).toString)
    val v = SnapshotTable.compact(
      org.apache.spark.sql.SparkSession.active, dir, n, statsCol)
    val out: Scan = new LocalScan {
      override def readSchema(): StructType = StructType(Seq(
        StructField("new_version", IntegerType, nullable = false),
        StructField("n_files", IntegerType, nullable = false)))
      override def rows(): Array[InternalRow] = Array(
        InternalRow(v, SnapshotTable.manifestFiles(dir, v).length))
    }
    java.util.List.of(out).iterator()
  }
}

/** `CALL <cat>.repair_spec(table => '...' [, num_files => n])` —
  * targeted partition-spec repair ([[graft.io.SnapshotTable
  * .repairPartitionSpec]]): rewrite ONLY the pre-evolution
  * unknown-tuple files so the table is SPJ-eligible and
  * metadata-DELETE-decidable again; returns the new version and how
  * many files were repaired (version -1 = nothing to repair). */
private[sources] class RepairSpecProcedure(cat: SnapshotCatalog)
    extends UnboundProcedure with BoundProcedure {
  import org.apache.spark.sql.types._
  override def name(): String = "repair_spec"
  override def description(): String =
    "rewrite only the pre-evolution UNKNOWN-tuple files"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to the catalog root").build(),
    ProcedureParameter.in("num_files", IntegerType).defaultValue("1")
      .comment("target file count for the repaired slice").build())
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = cat.tableDir(input.getUTF8String(0).toString)
    val n = if (input.isNullAt(1)) 1 else input.getInt(1)
    val before = SnapshotTable.versions(dir).lastOption.getOrElse(0)
    val repaired = SnapshotTable.repairPartitionSpec(
      org.apache.spark.sql.SparkSession.active, dir, n)
    val nFixed = repaired.fold(0)(v =>
      SnapshotTable.manifestFiles(dir, v).length -
        SnapshotTable.manifestFiles(dir, before).length +
        SnapshotTable.readPartValues(dir, before)
          .map(_.count(_.exists(SnapshotTable.isUnknownPart)))
          .getOrElse(0))
    val out: Scan = new LocalScan {
      override def readSchema(): StructType = StructType(Seq(
        StructField("new_version", IntegerType, nullable = false),
        StructField("repaired_files", IntegerType, nullable = false)))
      override def rows(): Array[InternalRow] = Array(
        InternalRow(repaired.getOrElse(-1), nFixed))
    }
    java.util.List.of(out).iterator()
  }
}

/** `CALL <cat>.compact_small(table [, small_bytes, num_files])` —
  * the binpack OPTIMIZE ([[SnapshotTable.compactSmall]]): rewrite
  * only the files under the size threshold, carry the rest. */
private[sources] class CompactSmallProcedure(cat: SnapshotCatalog)
    extends UnboundProcedure with BoundProcedure {
  import org.apache.spark.sql.types._
  override def name(): String = "compact_small"
  override def description(): String =
    "binpack OPTIMIZE: rewrite only files below the size threshold"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to the catalog root").build(),
    ProcedureParameter.in("small_bytes", LongType)
      .defaultValue("134217728")
      .comment("files below this byte size rewrite (default 128 MiB)")
      .build(),
    ProcedureParameter.in("num_files", IntegerType).defaultValue("1")
      .comment("target file count for the binpacked slice").build())
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = cat.tableDir(input.getUTF8String(0).toString)
    val bytes = if (input.isNullAt(1)) 134217728L else input.getLong(1)
    val n = if (input.isNullAt(2)) 1 else input.getInt(2)
    val v = SnapshotTable.compactSmall(
      org.apache.spark.sql.SparkSession.active, dir, bytes, n)
    val out: Scan = new LocalScan {
      override def readSchema(): StructType = StructType(Seq(
        StructField("new_version", IntegerType, nullable = false)))
      override def rows(): Array[InternalRow] = Array(
        InternalRow(v.getOrElse(-1)))
    }
    java.util.List.of(out).iterator()
  }
}

/** `CALL <cat>.tag(table, name [, version])` /
  * `remove_tag(table, name)` / `tags(table)` — named refs
  * ([[SnapshotTable.tag]]): a tag pins a version for `tagAsOf` reads
  * and against vacuum until removed. */
private[sources] class TagProcedure(cat: SnapshotCatalog)
    extends UnboundProcedure with BoundProcedure {
  import org.apache.spark.sql.types._
  override def name(): String = "tag"
  override def description(): String = "pin a named tag to a version"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to the catalog root").build(),
    ProcedureParameter.in("name", StringType)
      .comment("tag name ([A-Za-z0-9._-]+)").build(),
    ProcedureParameter.in("version", IntegerType).defaultValue("-1")
      .comment("version to pin (default: latest)").build())
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = cat.tableDir(input.getUTF8String(0).toString)
    val nm = input.getUTF8String(1).toString
    val ver = if (input.isNullAt(2) || input.getInt(2) < 0) None
              else Some(input.getInt(2))
    val pinned = SnapshotTable.tag(dir, nm, ver)
    val out: Scan = new LocalScan {
      override def readSchema(): StructType = StructType(Seq(
        StructField("pinned_version", IntegerType, nullable = false)))
      override def rows(): Array[InternalRow] = Array(InternalRow(pinned))
    }
    java.util.List.of(out).iterator()
  }
}

private[sources] class RemoveTagProcedure(cat: SnapshotCatalog)
    extends UnboundProcedure with BoundProcedure {
  import org.apache.spark.sql.types._
  override def name(): String = "remove_tag"
  override def description(): String = "drop a named tag"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to the catalog root").build(),
    ProcedureParameter.in("name", StringType)
      .comment("tag name").build())
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = cat.tableDir(input.getUTF8String(0).toString)
    SnapshotTable.removeTag(dir, input.getUTF8String(1).toString)
    val out: Scan = new LocalScan {
      override def readSchema(): StructType = StructType(Seq(
        StructField("removed", BooleanType, nullable = false)))
      override def rows(): Array[InternalRow] = Array(InternalRow(true))
    }
    java.util.List.of(out).iterator()
  }
}

private[sources] class TagsProcedure(cat: SnapshotCatalog)
    extends UnboundProcedure with BoundProcedure {
  import org.apache.spark.sql.types._
  override def name(): String = "tags"
  override def description(): String = "list named tags"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to the catalog root").build())
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = cat.tableDir(input.getUTF8String(0).toString)
    val tagRows = SnapshotTable.tags(dir).toSeq.sortBy(_._1).map {
      case (n, v) => InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(n), v)
    }.toArray
    val out: Scan = new LocalScan {
      override def readSchema(): StructType = StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false)))
      override def rows(): Array[InternalRow] = tagRows
    }
    java.util.List.of(out).iterator()
  }
}

/** `CALL <cat>.history(table => '...')` — `DESCRIBE HISTORY`
  * ([[SnapshotTable.history]]): one row per retained version, newest
  * first, answered from manifest bytes alone:
  * (version, action, ts_millis, n_files, n_rows). */
/** `CALL <cat>.partitions(table => '...')` — SHOW PARTITIONS from
  * manifest bytes ([[graft.io.SnapshotTable.partitionSummary]]): one
  * (partition, n_files, n_rows) row per recorded value tuple, zero
  * data IO. */
private[sources] class PartitionsProcedure(cat: SnapshotCatalog)
    extends UnboundProcedure with BoundProcedure {
  import org.apache.spark.sql.types._
  override def name(): String = "partitions"
  override def description(): String =
    "the table's partition inventory from manifest bytes"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to the catalog root").build())
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = cat.tableDir(input.getUTF8String(0).toString)
    val parts = SnapshotTable.partitionSummary(dir).map {
      case (p, nf, nr) => InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(p), nf, nr)
    }.toArray
    val out: Scan = new LocalScan {
      override def readSchema(): StructType = StructType(Seq(
        StructField("partition", StringType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false)))
      override def rows(): Array[InternalRow] = parts
    }
    java.util.List.of(out).iterator()
  }
}

private[sources] class HistoryProcedure(cat: SnapshotCatalog)
    extends UnboundProcedure with BoundProcedure {
  import org.apache.spark.sql.types._
  override def name(): String = "history"
  override def description(): String =
    "the table's commit history, newest first, from manifest bytes"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false
  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name relative to the catalog root").build())
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = cat.tableDir(input.getUTF8String(0).toString)
    val hist = SnapshotTable.versions(dir).reverse.map { v =>
      InternalRow(v.toLong, org.apache.spark.unsafe.types.UTF8String
          .fromString(SnapshotTable.readAction(dir, v)),
        SnapshotTable.commitTimestamp(dir, v).getOrElse(-1L),
        SnapshotTable.manifestFiles(dir, v).length.toLong,
        SnapshotTable.manifestCount(dir, v).getOrElse(-1L))
    }.toArray
    val out: Scan = new LocalScan {
      override def readSchema(): StructType = StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("action", StringType, nullable = false),
        StructField("ts_millis", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false)))
      override def rows(): Array[InternalRow] = hist
    }
    java.util.List.of(out).iterator()
  }
}
