package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
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
  *   SELECT * FROM graft_cat.events VERSION AS OF 2   -- time travel
  * }}}
  *
  * A table IS a directory `root/<ns...>/<name>` holding the snapshot
  * log; the catalog is STATELESS — every lookup reads the log, so
  * external writers through [[graft.io.SnapshotTable]] or the DSv2
  * path-based source are immediately visible (the log is the single
  * source of truth, never a catalog cache). CREATE TABLE publishes an
  * empty schema-bearing v1 (the table is readable before its first
  * INSERT); DELETE arrives through [[SnapshotDsTable]]'s SupportsDelete
  * and lowers to the copy-on-write [[SnapshotTable.delete]] — only
  * touched files rewrite, prior versions stay time-travelable.
  * `VERSION AS OF` resolves through `loadTable(ident, version)`;
  * `TIMESTAMP AS OF` is refused loudly (the manifest records no commit
  * timestamps — a deliberate format choice, versions are the contract).
  */
class SnapshotCatalog extends TableCatalog {
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
    val base = new java.io.File((root +: namespace.toSeq).mkString("/"))
    Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        SnapshotTable.versions(f.getAbsolutePath).nonEmpty)
      .map(f => Identifier.of(namespace, f.getName))
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

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "TIMESTAMP AS OF: the snapshot manifest records versions, not " +
        "commit timestamps — use VERSION AS OF")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "snapshot tables do not record partition transforms")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val dir = dirOf(ident)
    // publish an empty schema-bearing v1: the table is readable (and
    // time-travelable to its empty state) before the first INSERT
    val rel = "data/w_create/part-empty.parquet"
    new java.io.File(s"$dir/data/w_create").mkdirs()
    new ParquetGroupWriter(s"$dir/$rel", schema, -1).close()
    SnapshotTable.commitStagedFiles(dir, Seq(rel), schema)
    table(ident, None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE: schema evolution happens at WRITE time " +
        "(add-column-only, the snapshot commit contract)")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = new java.io.File(dirOf(ident))
    if (!dir.isDirectory) false
    else {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(dir)
      true
    }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    val dst = new java.io.File(dirOf(to))
    Option(dst.getParentFile).foreach(_.mkdirs())
    require(new java.io.File(dirOf(from)).renameTo(dst),
      s"rename $from -> $to failed")
  }
}
