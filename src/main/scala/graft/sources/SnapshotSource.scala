package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type => ParquetType, Types => PTypes}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsDelete, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, LocalScan, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => StreamingOffset}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.io.SnapshotTable

/** DataSourceV2 READ surface for the [[graft.io.SnapshotTable]]
  * lakehouse tier — the hook that lets plain `spark.read` / SQL reach
  * time travel, the way Delta/Iceberg consumers actually read their
  * tables (the API-only `readSnapshot` can't be reached from a
  * `spark.read.format(...)` pipeline or a temp-view SQL surface):
  *
  * `spark.read.format("graft.sources.SnapshotSource")
  *   .option("versionAsOf", 3).load(dir)`
  *
  * Planning is MANIFEST-DRIVEN end to end, the storage layer's core
  * contract: the schema comes from the log (evolved columns null-fill
  * on files that predate them), the file list comes from the version's
  * manifest (never a directory listing), and range/equality filters on
  * the manifest's recorded stats column PRUNE FILES at planning time —
  * the q154 min/max skipping tier surfaced as DSv2
  * `SupportsPushDownFilters` (visible as PushedFilters in explain).
  * File pruning is a may-contain decision, so every filter is also
  * returned as a residual for Spark to re-apply row-level — exactly the
  * parquet row-group-stats contract.
  *
  * Each input partition is a BYTE RANGE of one manifest data file —
  * files over `maxSplitBytes` (default 128 MB, Spark's
  * `files.maxPartitionBytes` contract) split into row-group-aligned
  * range partitions ([[SnapshotScan.split]]), so one huge compacted
  * file no longer serializes through a single task. Ranges are read
  * executor-side VECTORIZED by default — Spark's own columnar parquet
  * reader through the DSv2 `supportColumnarReads` seam
  * ([[SnapshotColumnarReader]]; measured within ~1.35× of Spark's
  * native parquet scan at 100×) — with the record-at-a-time
  * parquet-hadoop Group path ([[ParquetGroupReader]]) kept as the
  * `.option("vectorizedRead", false)` escape and parity baseline;
  * column pruning reaches the page level either way. Supported column
  * types are the flat primitives the snapshot tier commits
  * (long/int/double/float/boolean/string/binary/date/timestamp). */
class SnapshotSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = SnapshotSource.dir(options.asScala.toMap)
    val v = SnapshotTable.resolveVersion(dir,
      Option(options.get("versionAsOf")).map(_.toInt)
        .orElse(Option(options.get("tagAsOf"))
          .map(SnapshotTable.resolveTag(dir, _))))
    val base = SnapshotTable.readSchema(dir, v).getOrElse(
      // legacy pre-schema manifest: infer from the first file's footer
      SnapshotSource.footerSchema(
        s"$dir/${SnapshotTable.manifestFiles(dir, v).head}"))
    // CHANGE-DATA-FEED reads carry the change metadata as columns
    if (Option(options.get("readChangeFeed")).exists(_.trim.toBoolean))
      StructType(base.fields :+
        StructField("_change_type", StringType, nullable = false) :+
        StructField("_commit_version", LongType, nullable = false))
    else base
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SnapshotDsTable(schema, properties.asScala.toMap)
  // true so the WRITE path hands the query schema straight to getTable —
  // a first commit targets a directory with no log to infer from (reads
  // with no user schema still come through inferSchema above)
  override def supportsExternalMetadata(): Boolean = true
}

object SnapshotSource {
  private[sources] def dir(props: Map[String, String]): String =
    props.getOrElse("path",
      throw new IllegalArgumentException(
        "SnapshotSource needs a table path: .load(dir)"))

  // one XML-parsed Configuration per JVM; per-use copies are cheap —
  // `new Configuration()` re-parses core-default.xml every call, which
  // at one reader per file partition is the dominant fixed cost of a
  // small-file scan (measured ~2x on q214's 20-file sf0.1 shape)
  private lazy val baseConf = new Configuration()
  private[sources] def newConf(): Configuration = new Configuration(baseConf)

  /** The session confs the parquet schema converter consumes, captured
    * DRIVER-SIDE at reader-factory build and shipped to the executors:
    * a session with non-default settings (case sensitivity, binary-as-
    * string, timezone) must get the same read semantics through the
    * vectorized snapshot path as through a native parquet scan — the
    * executor has no session to ask, so pinning constants there would
    * silently diverge. Rebase modes stay CORRECTED (the snapshot writer
    * only emits modern TIMESTAMP(MICROS)/DATE logical types, so there
    * is no legacy calendar to rebase). */
  private[sources] def sessionReadConfs(): Map[String, String] = {
    val c = org.apache.spark.sql.internal.SQLConf.get
    Map(
      "spark.sql.parquet.binaryAsString" ->
        c.isParquetBinaryAsString.toString,
      "spark.sql.parquet.int96AsTimestamp" ->
        c.isParquetINT96AsTimestamp.toString,
      "spark.sql.caseSensitive" -> c.caseSensitiveAnalysis.toString,
      "spark.sql.parquet.inferTimestampNTZ.enabled" ->
        c.getConfString("spark.sql.parquet.inferTimestampNTZ.enabled",
          "true"),
      "spark.sql.legacy.parquet.nanosAsLong" ->
        c.getConfString("spark.sql.legacy.parquet.nanosAsLong", "false"),
      "spark.sql.session.timeZone" -> c.sessionLocalTimeZone)
  }

  /** The Hadoop filesystem owning `path` — every file operation in the
    * connector (staging deletes, aborts, catalog DROP/RENAME) resolves
    * through this instead of `java.io.File`, so the same code paths
    * work against `file:`, HDFS, or an object store: a 100 TB lakehouse
    * lives where `java.io.File` can't reach. Local specs exercise the
    * identical API through `file:` URIs (RawLocalFileSystem). */
  private[sources] def fs(path: String): FileSystem =
    new Path(path).getFileSystem(newConf())

  /** Best-effort single-file delete via the FS API (staging cleanup:
    * a file that never existed or was already removed is not an
    * error). */
  private[sources] def deleteQuiet(path: String): Unit = {
    val p = new Path(path)
    fs(path).delete(p, false): Unit
  }

  /** The sorted positional-delete set of ONE data file (`rel` — the
    * manifest-relative path the sidecars key on), read executor-side
    * from the version's delete sidecars at partition open. Each dirty
    * file's task re-reads the (small) sidecars; the alternative —
    * shipping every file's positions through the driver — collects
    * unbounded state at planning. */
  private[sources] def deletedPositions(delFiles: Seq[String],
                                        rel: String): Array[Long] = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file", StringType),
      org.apache.spark.sql.types.StructField("pos", LongType)))
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    delFiles.foreach { f =>
      val r = new ParquetGroupReader(f, schema)
      try {
        while (r.next()) {
          val row = r.get()
          if (!row.isNullAt(0) && !row.isNullAt(1) &&
              row.getUTF8String(0).toString == rel)
            buf += row.getLong(1)
        }
      } finally r.close()
    }
    val a = buf.toArray
    java.util.Arrays.sort(a)
    a
  }

  /** Parquet MessageType → StructType for legacy manifests — the exact
    * inverse of [[SnapshotWrite.parquetType]], nested standard layouts
    * (LIST/MAP/group) included. */
  private[sources] def catalystType(
      f: org.apache.parquet.schema.Type): DataType = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    if (f.isPrimitive) {
      val p = f.asPrimitiveType()
      val logical = p.getLogicalTypeAnnotation
      p.getPrimitiveTypeName match {
        case INT64
          if logical.isInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation] =>
          TimestampType
        case INT64 => LongType
        case INT32
          if logical.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
          DateType
        case INT32 => IntegerType
        case DOUBLE => DoubleType
        case FLOAT => FloatType
        case BOOLEAN => BooleanType
        case BINARY
          if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
          StringType
        case BINARY => BinaryType
        case other =>
          throw new IllegalArgumentException(
            s"unsupported parquet type $other for ${f.getName}")
      }
    } else {
      val gt = f.asGroupType()
      gt.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
          val wrapper = gt.getType(0).asGroupType() // repeated `list`
          ArrayType(catalystType(wrapper.getType(0)), containsNull = true)
        case _: LogicalTypeAnnotation.MapLogicalTypeAnnotation =>
          val kv = gt.getType(0).asGroupType() // repeated `key_value`
          MapType(catalystType(kv.getType(0)), catalystType(kv.getType(1)),
            valueContainsNull = true)
        case _ =>
          StructType(gt.getFields.asScala.map(c =>
            StructField(c.getName, catalystType(c), nullable = true)).toSeq)
      }
    }
  }

  private[sources] def footerSchema(file: String): StructType = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), newConf()))
    try {
      val msg = reader.getFooter.getFileMetaData.getSchema
      StructType(msg.getFields.asScala.map(f =>
        StructField(f.getName, catalystType(f), nullable = true)).toSeq)
    } finally reader.close()
  }
}

class SnapshotDsTable(tableSchema: StructType, props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  /** `_file` — the data file a row lives in, the metadata column the
    * row-level rewrites group by (Iceberg/Delta expose the same). A
    * query can also select it directly (`SELECT _file, * FROM t`). */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "path of the data file the row was read from"
    })
  private val dir = SnapshotSource.dir(props)
  override def name(): String = s"graft_snapshot($dir)"
  override def schema(): StructType = tableSchema
  /** The table's hive-style partition columns as identity transforms
    * (introspection: DESCRIBE-style surfaces read this); empty for an
    * unpartitioned or not-yet-created table. */
  override def partitioning(): Array[Transform] =
    try SnapshotTable.partitionColumns(dir,
        SnapshotTable.resolveVersion(dir))
      .map(Expressions.identity).toArray
    catch { case scala.util.control.NonFatal(_) => Array.empty }
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // version resolution happens HERE, not at table construction — a
    // write-path table may target a directory whose log does not exist yet
    require(Seq("versionAsOf", "timestampAsOf", "tagAsOf")
        .count(props.contains) <= 1,
      "versionAsOf, timestampAsOf and tagAsOf are mutually exclusive")
    // timestampAsOf: epoch millis, resolved to the latest version whose
    // commit timestamp is <= it (the Delta TIMESTAMP AS OF contract —
    // see SnapshotTable.resolveTimestamp for the refusal cases);
    // tagAsOf: a named ref pinned by SnapshotTable.tag
    val v = props.get("timestampAsOf")
      .map(t => SnapshotTable.resolveTimestamp(dir, t.trim.toLong))
      .getOrElse(SnapshotTable.resolveVersion(dir,
        props.get("versionAsOf").map(_.toInt)
          .orElse(props.get("tagAsOf")
            .map(SnapshotTable.resolveTag(dir, _)))))
    new SnapshotScanBuilder(dir, v, tableSchema, props)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SnapshotWriteBuilder(dir, info.schema(),
      Option(info.options.get("statsCol")),
      Option(info.options.get("partitionBy")), info.queryId())

  /** `DELETE FROM` lowers to the copy-on-write [[SnapshotTable.delete]]
    * — a new commit rewriting only the touched files; prior versions
    * stay time-travelable. Only filters expressible as v1 `Filter`s
    * arrive here (Spark asks [[canDeleteWhere]] first and errors toward
    * a row-level plan otherwise), and a version-pinned table refuses
    * (history is immutable — DML targets the latest version). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    props.get("versionAsOf").isEmpty && props.get("tagAsOf").isEmpty &&
      filters.forall(SnapshotDelete.toColumn(_).isDefined)
  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(props.get("versionAsOf").isEmpty &&
        props.get("tagAsOf").isEmpty,
      "DELETE on a VERSION/TAG AS OF read: history is immutable")
    // METADATA-ONLY fast path: a delete whose every filter is an
    // equality / IS NULL on a distinct PARTITION column drops whole
    // value-pure partitions from the manifest — zero data IO, no scan
    // (the Delta partition-delete; at 100 TB "drop the bad day" is one
    // manifest write). Anything else — non-partition columns, IN
    // lists, repeated columns — falls back to the partition-aware
    // copy-on-write rewrite, which is always correct.
    val latest = SnapshotTable.resolveVersion(dir)
    // hidden partitioning: "src = v" must NOT drop the whole transform
    // CELL (it holds other rows) — only identity columns may take the
    // metadata path; everything else falls to copy-on-write
    val pcols = SnapshotTable.partitionColumns(dir, latest)
      .zip(SnapshotTable.readPartTransforms(dir, latest))
      .collect { case (c, "id") => c }.toSet
    val partIn: Option[Map[String, Seq[Any]]] =
      if (pcols.isEmpty || filters.isEmpty) None
      else {
        val kvs: Array[Option[(String, Seq[Any])]] = filters.map {
          case EqualTo(a, v) if pcols(a) && v != null =>
            Some(a -> Seq[Any](v))
          case EqualNullSafe(a, v) if pcols(a) =>
            Some(a -> Seq[Any](v))
          case IsNull(a) if pcols(a) => Some(a -> Seq[Any](null))
          // IN on a partition column: `a IN (..., NULL)` never matches
          // the NULL partition under SQL semantics — drop null elements
          // from the kept set
          case In(a, vs) if pcols(a) && vs.exists(_ != null) =>
            Some(a -> vs.filter(_ != null).toSeq)
          case _ => None
        }
        val flat = kvs.flatten
        if (kvs.forall(_.isDefined) &&
            flat.map(_._1).distinct.length == flat.length)
          Some(flat.toMap)
        else None
      }
    def cow(): Unit = {
      val pred = filters.flatMap(SnapshotDelete.toColumn)
        .reduceOption(_ && _)
        .getOrElse(org.apache.spark.sql.functions.lit(true))
      SnapshotTable.delete(
        org.apache.spark.sql.SparkSession.active, dir, pred): Unit
    }
    partIn match {
      case Some(sets) =>
        // the metadata path REFUSES a delete that would empty the
        // table (the manifest convention); SQL must not surface that
        // refusal — fall back to the copy-on-write path, whose
        // zero-row anchor file represents an emptied table correctly
        // ... and a pre-evolution file with an unknown value for a
        // constrained column cannot be decided from metadata — both
        // refusals route to the always-correct copy-on-write rewrite
        try SnapshotTable.deletePartitionsIn(dir, sets): Unit
        catch {
          case e: IllegalArgumentException
              if e.getMessage != null &&
                (e.getMessage.contains("would empty the table") ||
                  e.getMessage.contains("cannot decide file")) => cow()
        }
      case None => cow()
    }
  }

  /** SQL `UPDATE` / `MERGE INTO` (and `DELETE` with a predicate the v1
    * metadata path can't translate) — Spark's row-level-operation
    * rewrite: the planner rebuilds the affected groups' content and
    * this operation's write REPLACES them as one overwrite commit
    * (GROUP-BASED copy-on-write, the Delta/Iceberg CoW mode; history
    * stays time-travelable like every commit). The scan is the plain
    * table scan, so the SQL verbs rewrite the FULL table — correct at
    * any size, and the honest caveat: the API tier
    * ([[graft.io.SnapshotTable.delete/update/merge]]) rewrites only
    * TOUCHED files and is the 100 TB path; narrowing this SQL path
    * needs `_file` metadata-column runtime filtering (the documented
    * next step, not a semantics change). DML on a pinned version
    * refuses at plan time — history is immutable. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(!props.contains("versionAsOf") &&
      !props.contains("timestampAsOf") && !props.contains("tagAsOf"),
      s"${info.command()} on a time-traveled read: history is immutable")
    // the SQL rewrite writes through the DSv2 writer, which records no
    // partition values — publishing its files onto a partitioned table
    // would half-state the manifest; the API tier
    // (SnapshotTable.delete/update/merge) IS partition-aware. DELETE
    // must NOT refuse here: Spark builds the row-level plan at
    // analysis even when the optimizer later takes the SupportsDelete
    // metadata path (canDeleteWhere) — the partition-equality fast
    // path. A DELETE that genuinely needs the row-level write refuses
    // at write-build time instead.
    if (info.command() != Command.DELETE)
      require(SnapshotTable.partitionColumns(dir,
          SnapshotTable.resolveVersion(dir)).isEmpty,
        s"SQL ${info.command()} on a PARTITIONED snapshot table: use " +
          "the API DML tier (SnapshotTable.delete/update/merge), which " +
          "rewrites partition-aware")
    () => new SnapshotRowLevelOperation(dir, tableSchema, info.command(),
      props)
  }
}

/** Group-based (copy-on-write) row-level operation over the snapshot
  * log: the scan reads the operation's pinned version — narrowed to the
  * TOUCHED files when Spark plans runtime group filtering over the
  * `_file` metadata column — and the write publishes one commit that
  * carries every untouched file by reference and replaces exactly the
  * scanned groups with the rebuilt rows (the API DML tier's
  * touched-files contract, reached from plain SQL). */
private[sources] class SnapshotRowLevelOperation(
    dir: String, tableSchema: StructType, cmd: Command,
    props: Map[String, String]) extends RowLevelOperation {
  private val scanVersion = SnapshotTable.resolveVersion(dir)
  private val state = new GroupFilterState(
    SnapshotTable.manifestFiles(dir, scanVersion).map(f => s"$dir/$f"))
  override def command(): Command = cmd
  override def description(): String =
    s"graft_snapshot CoW $cmd($dir)"
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SnapshotScanBuilder(dir, scanVersion, tableSchema, props,
      Some(state))
  // requiring `_file` metadata puts the rewrite on Spark's
  // data+metadata write path (the writer receives the PROJECTED data
  // row — the raw ReplaceData row carries a leading __row_operation
  // marker that must never reach a data file) and feeds the runtime
  // group filter above
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        // reached only when the row-level rewrite will actually RUN
        // (a translatable DELETE took the SupportsDelete metadata path
        // long before this) — its writer records no partition values,
        // so a partitioned table refuses toward the API tier
        require(SnapshotTable.partitionColumns(dir, scanVersion).isEmpty,
          s"SQL $cmd on a PARTITIONED snapshot table: use the API DML " +
            "tier (SnapshotTable.delete/update/merge), which rewrites " +
            "partition-aware")
        new Write {
          override def toBatch: BatchWrite = new SnapshotReplaceGroupsWrite(
            dir, info.schema(), scanVersion, state,
            cmd.toString.toLowerCase)
        }
      }
    }
}

/** The row-level replacement write: commits `(scanVersion's files −
  * the scanned groups) + the staged rewrite` as one new version, with
  * untouched files' stats carried and rewritten files' stats
  * recomputed ([[SnapshotTable.publish]] — the exact mechanics of the
  * API DML commits). Rewriting everything away leaves an empty but
  * readable table (a zero-row schema-bearing file), matching the API
  * delete convention. */
private[sources] class SnapshotReplaceGroupsWrite(
    dir: String, writeSchema: StructType, scanVersion: Int,
    state: GroupFilterState, action: String) extends BatchWrite {
  private val sub = s"data/w${java.util.UUID.randomUUID().toString.take(8)}"
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new SnapshotWriterFactory(dir, sub, writeSchema, Array.empty)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged0 = messages.collect { case m: SnapshotCommitMsg => m }
      .flatMap(_.files.map(_.relPath)).sorted.toSeq
    val scannedRel = state.scanned.map(_.stripPrefix(s"$dir/")).toSet
    val untouched = SnapshotTable.manifestFiles(dir, scanVersion)
      .filterNot(scannedRel)
    val spark = org.apache.spark.sql.SparkSession.active
    val staged =
      if (staged0.nonEmpty || untouched.nonEmpty) staged0
      else {
        // rewrote everything away: stage one zero-row schema-bearing
        // anchor so the committed version stays readable (the API
        // delete convention); publish gives its stats the always-prune
        // sentinel
        val rel = s"$sub/part-empty.parquet"
        new ParquetGroupWriter(s"$dir/$rel", writeSchema,
          Array.empty).close()
        Seq(rel)
      }
    // CHANGE-DATA-FEED sidecar for the SQL path: the group-based
    // rewrite hands the writer only replacement rows (no per-row
    // operation, no keys), so the row-level changes are derived at
    // commit as the NET MULTISET DIFF between the scanned groups'
    // original rows and the staged replacement rows — exceptAll both
    // ways, one extra pass over only the touched+staged files.
    //  - DELETE: vanished rows are the deleted rows ('delete').
    //  - UPDATE: row count is preserved and every change is in-place,
    //    so vanished rows are exactly the preimages and new rows the
    //    postimages ('update_preimage'/'update_postimage'); a pair
    //    whose new value equals another row's old value cancels
    //    symmetrically — the feed records the commit's net row delta.
    //  - MERGE: an arbitrary WHEN-clause mix deletes, updates and
    //    inserts in one commit; without the ON keys the vanished/new
    //    rows cannot be paired into pre/postimages, so they feed as
    //    'delete'/'insert' — the same +/- algebra every incremental
    //    consumer applies (Delta's update is also a -pre/+post pair);
    //    the API tier (SnapshotTable.merge) records precise
    //    update_pre/postimages when the pairing matters.
    // (map-typed columns cannot run set operations — such a schema
    // skips the sidecar and keeps the refuse-at-read contract)
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => true
        case s: StructType => s.fields.exists(f => hasMap(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
        case _ => false
      }
    if (SnapshotTable.changeFeedEnabled(dir) &&
        !writeSchema.fields.exists(f => hasMap(f.dataType))) {
      import org.apache.spark.sql.functions.lit
      val dataSchema = SnapshotTable.readSchema(dir, scanVersion)
        .getOrElse(writeSchema)
      val reader = spark.read.schema(dataSchema)
      def readOr(paths: Seq[String]) =
        if (paths.isEmpty)
          spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            dataSchema)
        else reader.parquet(paths: _*)
      // the scanned groups' ORIGINAL rows must be their LOGICAL rows:
      // a dirty (merge-on-read) file's tombstoned positions are not
      // part of the table and must not re-record as deleted here
      val before =
        if (state.scanned.isEmpty) readOr(Nil)
        else SnapshotTable.planReadLogical(spark, dir, scanVersion,
          state.scanned.map(_.stripPrefix(s"$dir/")))
          .select(dataSchema.fieldNames.map(
            org.apache.spark.sql.functions.col(_)): _*)
      val after = readOr(staged.map(f => s"$dir/$f"))
      val gone = before.exceptAll(after)
      val fresh = after.exceptAll(before)
      val ct = "_change_type"
      val changes = action match {
        case "delete" => gone.withColumn(ct, lit("delete"))
        case "update" =>
          gone.withColumn(ct, lit("update_preimage"))
            .unionByName(fresh.withColumn(ct, lit("update_postimage")))
        case _ =>
          gone.withColumn(ct, lit("delete"))
            .unionByName(fresh.withColumn(ct, lit("insert")))
      }
      SnapshotTable.writeChanges(changes, dir, scanVersion + 1)
    }
    // publish at scanVersion + 1, NOT versions(dir).last + 1: the
    // rewrite's untouched set was resolved against scanVersion, so a
    // commit that landed in between would otherwise be silently
    // dropped (lost update). Pinning the target version makes the
    // manifest hard-link CAS refuse the race loudly instead — the same
    // optimistic-concurrency contract as the API DML tier.
    SnapshotTable.publish(spark, dir, scanVersion, scanVersion + 1,
      untouched, staged, action,
      SnapshotTable.readSchema(dir, scanVersion).orElse(Some(writeSchema)),
      writtenSub = Some(sub)): Unit
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: SnapshotCommitMsg => m }
      .flatMap(_.files)
      .foreach(f => SnapshotSource.deleteQuiet(s"$dir/${f.relPath}"))
}

/** v1 `Filter` → `Column` translation for the DELETE path — the
  * standard comparison/null/set/boolean subset; anything else makes
  * `canDeleteWhere` answer false so Spark fails toward a row-level
  * plan instead of silently deleting the wrong rows. */
private[sources] object SnapshotDelete {
  import org.apache.spark.sql.functions.{col, lit, not}
  import org.apache.spark.sql.sources._
  def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq.map(lit(_)): _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
    case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case Not(c) => toColumn(c).map(not)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

class SnapshotScanBuilder(dir: String, version: Int, tableSchema: StructType,
                          props: Map[String, String] = Map.empty,
                          groupFilter: Option[GroupFilterState] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private val statsCols = SnapshotTable.statsColumns(dir, version).toSet
  private val partCols = SnapshotTable.partitionColumns(dir, version).toSet
  // HIDDEN-PARTITIONING transforms: predicates arrive on the SOURCE
  // column; pruning maps literals through the column's transform
  // (identity included — its literal() is the old partValueString)
  private val partT: Map[String, graft.io.PartTransform] =
    graft.io.SnapshotTable.partTransformsOf(dir, version)
      .map(t => t.src -> t).toMap
  private val bounds =
    scala.collection.mutable.Map.empty[String, (Long, Long)]
  // partition column -> surviving value set (None = the NULL partition);
  // successive predicates intersect
  private val partKeep =
    scala.collection.mutable.Map.empty[String, Set[Option[String]]]
  // partition column -> transform-space [lo, hi] (monotone transforms:
  // a range on the source prunes cells by transform-value comparison)
  private val partRange = scala.collection.mutable.Map.empty[String,
    (Option[String], Option[String])]
  // stats column -> null-predicate prune (true = IS NULL keeps files
  // with nulls, false = IS NOT NULL keeps files with non-nulls). A
  // contradictory conjunction (both on one column) matches no rows;
  // pruning on either is sound — the residual row filter is exact.
  private val nullKeep = scala.collection.mutable.Map.empty[String, Boolean]
  private var pushed = Array.empty[Filter]
  private var required: StructType = tableSchema
  private var aggResult: Option[(StructType, Array[Long])] = None

  private def longOf(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l)
    case i: java.lang.Integer => Some(i.toLong)
    case _ => None
  }

  private def narrow(c: String, lo: Long, hi: Long): Unit =
    bounds(c) = bounds.get(c) match {
      case Some((a, b)) => (math.max(a, lo), math.min(b, hi))
      case None => (lo, hi)
    }

  private def keepVals(c: String, vs: Set[Option[String]]): Unit =
    partKeep(c) = partKeep.get(c).map(_.intersect(vs)).getOrElse(vs)

  private def narrowPart(c: String, lo: Option[String],
                         hi: Option[String]): Unit = {
    val ord = partT(c).valueOrd
    val (l0, h0) = partRange.getOrElse(c, (None, None))
    def maxO(a: Option[String], b: Option[String]) = (a, b) match {
      case (Some(x), Some(y)) => Some(if (ord.gteq(x, y)) x else y)
      case _ => a.orElse(b)
    }
    def minO(a: Option[String], b: Option[String]) = (a, b) match {
      case (Some(x), Some(y)) => Some(if (ord.lteq(x, y)) x else y)
      case _ => a.orElse(b)
    }
    partRange(c) = (maxO(l0, lo), minO(h0, hi))
  }

  private def partLit(v: Any): Option[String] =
    Option(v).map(SnapshotTable.partValueString)

  /** Range/equality filters on ANY recorded stats column narrow the
    * FILE LIST — predicates on different columns compound (each column
    * prunes independently and a file must survive them all); every
    * filter (including those) is returned as residual because file
    * stats are may-contain, not row-exact — the parquet row-group
    * contract. `pushedFilters` reports the pruning set for explain. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def tracked(a: String): Boolean = statsCols.contains(a)
    def isPart(a: String): Boolean = partCols.contains(a)
    pushed = filters.filter {
      // PARTITION pruning first (exact — files are value-pure); a
      // column that is both partition and stats prunes by value here
      case EqualTo(a, v) if isPart(a) && v != null =>
        partT(a).literal(v) match {
          case Some(s) => keepVals(a, Set(Some(s))); true
          case None => false // unmappable literal: residual only
        }
      case EqualNullSafe(a, v) if isPart(a) =>
        if (v == null) { keepVals(a, Set(None)); true }
        else partT(a).literal(v) match {
          case Some(s) => keepVals(a, Set(Some(s))); true
          case None => false
        }
      // SQL `a IN (..., NULL)` never matches NULL rows — drop null
      // elements (keeping them would retain the NULL partition's
      // files: sound but needlessly over-inclusive, and inconsistent
      // with the deleteWhere fast path). An all-NULL list keeps zero
      // partitions — exactly the rows the predicate matches.
      case In(a, vs) if isPart(a) && vs.nonEmpty =>
        val mapped = vs.filter(_ != null).map(partT(a).literal)
        if (mapped.exists(_.isEmpty)) false // one unmappable: decline
        else { keepVals(a, mapped.flatten.map(Option(_)).toSet); true }
      case IsNull(a) if isPart(a) =>
        keepVals(a, Set(None)); true
      // RANGE predicates on a MONOTONE transform's source (truncate /
      // calendar units — hidden partitioning's headline prune: "WHERE
      // ts >= X" skips to the right days): a source bound maps to an
      // INCLUSIVE transform-cell bound — the boundary cell may hold
      // rows on both sides, the residual row filter keeps it exact
      case GreaterThan(a, v) if isPart(a) && v != null &&
          partT(a).monotone =>
        partT(a).literal(v).exists { s => narrowPart(a, Some(s), None); true }
      case GreaterThanOrEqual(a, v) if isPart(a) && v != null &&
          partT(a).monotone =>
        partT(a).literal(v).exists { s => narrowPart(a, Some(s), None); true }
      case LessThan(a, v) if isPart(a) && v != null &&
          partT(a).monotone =>
        partT(a).literal(v).exists { s => narrowPart(a, None, Some(s)); true }
      case LessThanOrEqual(a, v) if isPart(a) && v != null &&
          partT(a).monotone =>
        partT(a).literal(v).exists { s => narrowPart(a, None, Some(s)); true }
      // NULL-predicate file pruning from the manifest's per-column
      // null counts: IS NULL skips files recording zero nulls,
      // IS NOT NULL skips all-null files (Spark pushes an IsNotNull
      // next to every comparison, so this also trims all-null files
      // from ordinary range queries for free)
      case IsNull(a) if tracked(a) => nullKeep(a) = true; true
      case IsNotNull(a) if tracked(a) => nullKeep(a) = false; true
      case EqualTo(a, v) if tracked(a) =>
        longOf(v).exists { l => narrow(a, l, l); true }
      case GreaterThan(a, v) if tracked(a) =>
        longOf(v).exists { l => narrow(a, l + 1, Long.MaxValue); true }
      case GreaterThanOrEqual(a, v) if tracked(a) =>
        longOf(v).exists { l => narrow(a, l, Long.MaxValue); true }
      case LessThan(a, v) if tracked(a) =>
        longOf(v).exists { l => narrow(a, Long.MinValue, l - 1); true }
      case LessThanOrEqual(a, v) if tracked(a) =>
        longOf(v).exists { l => narrow(a, Long.MinValue, l); true }
      // IN-list: the [min, max] ENVELOPE of the values — sound (file
      // stats are may-contain anyway, Spark re-applies the predicate
      // row-level) and exactly the pruning a point-lookup batch gets
      // from a range-clustered layout; the per-value set prune is the
      // Bloom sidecar's job (q211)
      case In(a, vs) if tracked(a) && vs.nonEmpty &&
          vs.forall(longOf(_).isDefined) =>
        val ls = vs.flatMap(longOf)
        narrow(a, ls.min, ls.max); true
      case _ => false
    }
    filters // all residual: Spark re-applies row-level
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** AGGREGATE pushdown to MANIFEST BYTES (the Delta/Iceberg
    * metadata-only-query trick): an unfiltered, ungrouped `count(*)` /
    * `min(statsCol)` / `max(statsCol)` answers from the per-file row
    * counts and (min, max) stats the manifest records at commit time —
    * ZERO data IO, no footer reads, one `LocalScan` row. Complete
    * pushdown only: every aggregate in the query must translate, the
    * manifest must record counts (pre-upgrade logs decline — never
    * estimate), and no filter may have narrowed the scan (Spark keeps
    * residual filters as plan nodes, which blocks aggregate pushdown
    * before it reaches here; `bounds.isEmpty` double-guards). */
  private def manifestAgg(agg: Aggregation)
      : Option[(StructType, Array[Long])] = {
    if (agg.groupByExpressions.nonEmpty || bounds.nonEmpty ||
        pushed.nonEmpty) return None
    def ref(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    // manifest stats are recorded via cast("long"), so a metadata
    // min/max answer is only type-correct for a BIGINT column — an INT
    // stats column must decline (Spark expects the column's own type
    // from a complete pushdown; handing it a Long is a wrong-schema
    // result, not an optimization)
    def col(f: AggregateFunc): Option[String] = {
      def longCol(c: String): Option[String] =
        Some(c).filter(n => tableSchema.fields.exists(f0 =>
          f0.name == n && f0.dataType == LongType))
      f match {
        case m: Min => ref(m.column()).flatMap(longCol)
        case m: Max => ref(m.column()).flatMap(longCol)
        case _ => None
      }
    }
    val count = SnapshotTable.manifestCount(dir, version)
    lazy val minMax = SnapshotTable.manifestMinMaxAll(dir, version)
    val vals = agg.aggregateExpressions().map {
      case _: CountStar => count.map(("count(*)", LongType, false, _))
      case m: Min => col(m).flatMap(c => minMax.get(c).map {
        case (lo, _) => (s"min($c)", LongType, true, lo)
      })
      case m: Max => col(m).flatMap(c => minMax.get(c).map {
        case (_, hi) => (s"max($c)", LongType, true, hi)
      })
      case _ => None
    }
    if (vals.exists(_.isEmpty)) None
    else {
      val vs = vals.map(_.get)
      Some((StructType(vs.map(v => StructField(v._1, v._2, v._3)).toSeq),
        vs.map(_._4)))
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    manifestAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    val r = manifestAgg(agg)
    aggResult = r.orElse(aggResult)
    r.isDefined
  }

  override def build(): Scan = aggResult match {
    case Some((schema, vals)) => SnapshotAggScan(schema, vals)
    case None => buildFileScan()
  }

  private def buildFileScan(): Scan = {
    val files = SnapshotTable.manifestFilesPruned(dir, version,
        bounds.toMap, partKeep.toMap, nullKeep.toMap, partRange.toMap)
      .map(f => s"$dir/$f")
    // recorded per-file byte sizes (absolute-path-keyed): splits and
    // statistics plan from manifest bytes — zero status calls
    val sizes: Map[String, Long] = SnapshotTable.readSizes(dir, version)
      .map(ss => SnapshotTable.manifestFiles(dir, version)
        .map(f => s"$dir/$f").zip(ss).toMap)
      .getOrElse(Map.empty)
    require(!(props.contains("startingVersion") &&
      props.contains("startingTimestamp")),
      "startingVersion and startingTimestamp are mutually exclusive")
    // partition tuples for the storage-partitioned-join report: typed
    // per-file keys let two same-keyed snapshot tables join (and the
    // key-grouped aggregate run) with zero exchanges
    // a TRANSFORM-partitioned scan must not report key-grouped
    // partitioning on the source columns: rows in one cell do NOT
    // share a source value, so the identity-clustering claim would
    // mis-key a join — decline (bucket-transform SPJ needs the V2
    // function-catalog plumbing; a sound decline beats a wrong join)
    val pcolsSeq =
      if (SnapshotTable.readPartTransforms(dir, version)
          .exists(_ != "id")) Nil
      else SnapshotTable.partitionColumns(dir, version)
    val partSchema = StructType(pcolsSeq.flatMap(c =>
      tableSchema.fields.find(_.name == c)))
    val partTuples: Map[String, Seq[Option[String]]] =
      if (pcolsSeq.isEmpty) Map.empty
      else SnapshotTable.readPartValues(dir, version)
        .map(pv => SnapshotTable.manifestFiles(dir, version)
          .map(f => s"$dir/$f").zip(pv)
          // a pre-evolution file's UNKNOWN tuple cannot key a
          // storage-partitioned join: leave it out, and the scan's
          // all-files-keyed guard declines the whole report
          .filterNot(_._2.exists(SnapshotTable.isUnknownPart))
          .toMap)
        .getOrElse(Map.empty)
    SnapshotScan(dir, files, required, version,
      Option((bounds.keys ++ partKeep.keys).toSeq.distinct.sorted
        .mkString(",")).filter(_.nonEmpty),
      props.get("startingVersion").map(_.trim.toInt),
      props.get("ignoreRewrites").exists(_.trim.toBoolean),
      props.get("maxSplitBytes").map(_.trim.toLong)
        .getOrElse(SnapshotScan.DefaultSplitBytes),
      props.get("vectorizedRead").forall(_.trim.toBoolean),
      groupFilter,
      props.get("startingTimestamp").map(_.trim.toLong),
      sizes,
      if (partSchema.length == pcolsSeq.length) partSchema
      else new StructType(), // a column missing from the schema: decline
      partTuples,
      props.get("readChangeFeed").exists(_.trim.toBoolean),
      props.get("endingVersion").map(_.trim.toInt),
      SnapshotTable.readDeletes(dir, version).map(f => s"$dir/$f"),
      SnapshotTable.readDirty(dir, version).toSet)
  }
}

/** Shared driver-side state between a row-level operation's SCAN and
  * its WRITE: the scan narrows `scanned` to the runtime-group-filtered
  * file set (full paths); the write replaces exactly those files. The
  * default — everything the scanned version holds — keeps the rewrite
  * correct when the optimizer plans no group filter. */
private[sources] final class GroupFilterState(val allFiles: Seq[String]) {
  @volatile var scanned: Seq[String] = allFiles
}

/** The one pre-aggregated row a manifest-answered aggregate produces —
  * Spark plans it as a `LocalTableScanExec`: the 100 TB `count(*)`
  * never touches an executor. */
case class SnapshotAggScan(schema: StructType, vals: Array[Long])
    extends LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] =
    Array(new GenericInternalRow(vals.map(_.asInstanceOf[Any])))
}

object SnapshotScan {
  /** Spark's `files.maxPartitionBytes` default — one reader task per
    * ~128 MB of parquet, the scan-parallelism contract. */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** Per-file `getFileStatus` calls paid at PLANNING time — the
    * fallback counter the spec pins at zero for a size-bearing
    * manifest (the whole point of recording sizes: planning a 10^6-file
    * table must not issue 10^6 status RPCs per query). */
  private[graft] val fsStatCalls = new java.util.concurrent.atomic.AtomicLong()

  /** A recorded partition-value string re-typed to the column's
    * Catalyst type (the inverse of
    * [[graft.io.SnapshotTable.partValueString]]); None for types this
    * source does not re-type — the scan then declines to report
    * key-grouped partitioning rather than mis-key a join. */
  private[sources] def typedPartValue(dt: DataType, s: String)
      : Option[Any] = dt match {
    case StringType => Some(UTF8String.fromString(s))
    case LongType => s.toLongOption
    case IntegerType => s.toIntOption
    case BooleanType => s.toBooleanOption
    case DateType => try {
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils
        .fromJavaDate(java.sql.Date.valueOf(s)))
    } catch { case scala.util.control.NonFatal(_) => None }
    case _ => None
  }

  /** Split one data file into byte-range partitions of ≤ `maxSplit`
    * bytes — a >128 MB file no longer serializes through one reader
    * task. Row groups are assigned to the split containing their
    * MIDPOINT offset (parquet-hadoop's `filterFileMetaDataByMidpoint`
    * range contract), so every row group is read by exactly one task
    * whatever the split grid tiles. The file length comes from the
    * MANIFEST (`knownLen` — recorded at commit, the Iceberg/Delta
    * add-file `size`); only a pre-size legacy manifest pays the
    * per-file `getFileStatus` fallback. */
  private[sources] def split(path: String, maxSplit: Long,
                             knownLen: Option[Long] = None)
      : Seq[SnapshotFilePartition] = {
    val len = knownLen.getOrElse {
      fsStatCalls.incrementAndGet()
      SnapshotSource.fs(path).getFileStatus(new Path(path)).getLen
    }
    if (len <= maxSplit) Seq(SnapshotFilePartition(path))
    else (0L until len by maxSplit).map(off =>
      SnapshotFilePartition(path, off, math.min(maxSplit, len - off)))
  }
}

case class SnapshotScan(dir: String, files: Seq[String],
                        required: StructType,
                        version: Int, prunedOn: Option[String],
                        startingVersion: Option[Int] = None,
                        ignoreRewrites: Boolean = false,
                        maxSplitBytes: Long = SnapshotScan.DefaultSplitBytes,
                        vectorized: Boolean = true,
                        groupFilter: Option[GroupFilterState] = None,
                        startingTimestamp: Option[Long] = None,
                        fileSizes: Map[String, Long] = Map.empty,
                        partSchema: StructType = new StructType(),
                        partTuples: Map[String, Seq[Option[String]]] =
                          Map.empty,
                        changeFeed: Boolean = false,
                        endingVersion: Option[Int] = None,
                        delFiles: Seq[String] = Nil,
                        dirtyRel: Set[String] = Set.empty)
    extends Scan with Batch with SupportsRuntimeV2Filtering
    with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  // runtime-group-filtered file set (row-level DML scans only; the
  // optimizer calls filter() before planInputPartitions)
  private var activeFiles: Seq[String] = files
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_snapshot v$version files=${files.size}" +
      prunedOn.fold("")(c => s" statsPruned=$c") +
      s" cols=${required.fieldNames.mkString(",")}"

  /** RUNTIME GROUP FILTERING for the row-level DML path (Spark's
    * `RowLevelOperationRuntimeGroupFiltering`): a pre-query finds the
    * `_file` values the DML condition touches, and this scan narrows
    * to exactly those files — the SQL UPDATE/MERGE/DELETE rewrite then
    * reads and REPLACES only touched groups, the same touched-files
    * contract as the API DML tier (at 100 TB the difference between a
    * surgical commit and a full-table rewrite). Plain scans advertise
    * no filterable attribute. */
  override def filterAttributes(): Array[NamedReference] =
    if (groupFilter.isDefined) Array(Expressions.column("_file"))
    else Array.empty
  override def filter(predicates: Array[Predicate]): Unit =
    groupFilter.foreach { st =>
      def ref(e: org.apache.spark.sql.connector.expressions.Expression) =
        e match {
          case r: NamedReference => r.fieldNames().sameElements(
            Array("_file"))
          case _ => false
        }
      val keep: Option[Set[String]] = predicates.collectFirst {
        case p if p.name() == "IN" && p.children().nonEmpty &&
            ref(p.children().head) =>
          p.children().drop(1).collect {
            case l: Literal[_] => l.value().toString
          }.toSet
        case p if p.name() == "=" && p.children().length == 2 &&
            ref(p.children().head) =>
          p.children().drop(1).collect {
            case l: Literal[_] => l.value().toString
          }.toSet
      }
      keep.foreach { k =>
        activeFiles = files.filter(k.contains)
        st.scanned = activeFiles
      }
    }
  /** STORAGE-PARTITIONED JOIN (the Iceberg SPJ contract): a
    * hive-partitioned snapshot scan reports `KeyGroupedPartitioning`
    * over its partition columns and every file partition carries its
    * typed tuple — two snapshot tables partitioned on the same key
    * then join with NO exchange on either side (and a `groupBy` on the
    * partition key aggregates exchange-free), which at 100 TB deletes
    * the single biggest cost of a fact⋈fact co-partitioned join.
    * Reported only when the report is KNOWN sound: a plain scan (no
    * runtime group filter), every planned file with a recorded tuple,
    * partition columns present in the projected schema (Spark resolves
    * the clustering references against the scan output), and tuple
    * types this source can re-type from their recorded strings.
    * Activation additionally needs `spark.sql.sources.v2.bucketing
    * .enabled` ([[graft.GraftSession]] sets it). */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val reportable = partSchema.nonEmpty && groupFilter.isEmpty &&
      !changeFeed && // feed partitions carry no keys
      partSchema.fieldNames.forall(required.fieldNames.contains) &&
      activeFiles.nonEmpty && activeFiles.forall(f => typedKey(f) != null)
    if (reportable)
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          partSchema.fieldNames
            .map(Expressions.identity(_)
              : org.apache.spark.sql.connector.expressions.Expression),
          activeFiles.map(partTuples).distinct.size)
    else
      // Spark's partitioning rule only inspects KeyGroupedPartitioning;
      // for Unknown it derives the physical partitioning from the
      // planned partitions themselves — don't plan them twice here
      new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(0)
  }

  /** The file's recorded tuple re-typed to the partition columns'
    * Catalyst types; null when any value's type cannot be re-typed
    * (the scan then reports `UnknownPartitioning` — decline, never
    * mis-key a join). */
  private def typedKey(file: String): InternalRow =
    partTuples.get(file) match {
      case None => null
      case Some(tuple) =>
        val vals = new Array[Any](tuple.length)
        var i = 0
        while (i < tuple.length) {
          tuple(i) match {
            case None => vals(i) = null
            case Some(s) =>
              SnapshotScan.typedPartValue(partSchema(i).dataType, s) match {
                case Some(v) => vals(i) = v
                case None => return null
              }
          }
          i += 1
        }
        new GenericInternalRow(vals)
    }

  override def planInputPartitions(): Array[InputPartition] =
    if (changeFeed) {
      // BATCH change-feed read (`spark.read` / `CREATE VIEW ... USING`
      // with readChangeFeed + startingVersion [+ endingVersion]): the
      // same per-version file partitions the streaming feed plans,
      // over the requested range in one batch — the SQL-reachable,
      // fully distributed spelling (feed rows never collect on the
      // driver)
      val vs = SnapshotTable.versions(dir)
      val from = startingVersion.getOrElse(vs.headOption.getOrElse(1))
      val until = endingVersion.getOrElse(vs.lastOption.getOrElse(0))
      // the consumer's names are the scan's pinned-version schema;
      // each version's files remap to their written names per file
      val curNames = SnapshotTable.readSchema(dir, version)
        .map(_.fieldNames.toSeq).getOrElse(Nil)
      vs.filter(v => v >= from && v <= until)
        .flatMap(v => SnapshotCdf.partitions(dir, v, curNames))
        .toArray[InputPartition]
    } else {
      // COLUMN-ID RENAMES: files written before a rename store the old
      // physical names; each partition carries its file's current→
      // written map (by schema position through the file's epoch) and
      // the reader factory remaps the requested schema per file. A
      // never-renamed table computes nothing.
      val eps = SnapshotTable.readEpochs(dir, version)
      val renameOf: String => Map[String, String] =
        if (eps.isEmpty) _ => Map.empty
        else {
          val cur = SnapshotTable.readSchema(dir, version).getOrElse(
            throw new IllegalStateException(
              s"v$version of $dir records rename epochs but no schema"))
          val se = SnapshotTable.manifestFiles(dir, version)
            .map(_.stripPrefix(s"$dir/"))
            .zip(SnapshotTable.readSepoch(dir, version)).toMap
          val byEpoch = eps.indices.map { e =>
            cur.fieldNames.toSeq
              .zip(SnapshotTable.epochNames(cur, eps, e))
              .filter { case (a, b) => a != b }.toMap
          }
          rel => se.get(rel).filter(_ < eps.length)
            .map(byEpoch).getOrElse(Map.empty)
        }
      activeFiles.flatMap { f =>
        val key = if (partSchema.isEmpty) null else typedKey(f)
        val rel = f.stripPrefix(s"$dir/")
        val ren = renameOf(rel)
        if (dirtyRel.contains(rel))
          // a DIRTY file reads UNSPLIT through the position-filtered row
          // reader: positional deletes are absolute in-file row indexes,
          // and a sequential whole-file read is the cheapest exact
          // counter (dirty files are the exception — compaction folds
          // them back to the split/vectorized fast path)
          Seq(SnapshotFilePartition(f, 0L, -1L, key, rel, delFiles, ren))
        else SnapshotScan.split(f, maxSplitBytes, fileSizes.get(f))
          .map(p => p.copy(
            partKey = if (key == null) p.partKey else key,
            renames = ren))
      }.toArray[InputPartition]
    }

  /** CBO-visible statistics SERVED FROM MANIFEST BYTES: exact row
    * counts (the per-file counts recorded at commit, summed over the
    * files this scan actually plans — stats pruning included) and byte
    * sizes from the manifest's recorded per-file lengths — zero
    * filesystem calls on a size-bearing table. Without this a DSv2
    * relation defaults to "unknown = huge" and a small snapshot
    * dimension NEVER broadcasts: the join-strategy decision — THE
    * 100 TB plan decision — would be wrong on every snapshot⋈fact join
    * (SnapshotSourceSpec asserts the broadcast plan). A pre-size legacy
    * manifest falls back to best-effort per-file status (NonFatal-
    * guarded: statistics estimation must never fail a query at plan
    * time — e.g. a file vacuumed between manifest read and stat — so
    * an unreadable size declines to "unknown" instead of throwing).
    * Column pruning scales the byte estimate by the projected fraction
    * of the schema's default row width, the same heuristic Spark's own
    * file sources apply. */
  override def estimateStatistics(): Statistics = {
    if (changeFeed) return new Statistics { // a feed's size is not the
      override def sizeInBytes(): java.util.OptionalLong = // table's —
        java.util.OptionalLong.empty()                     // decline
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
    val rel = activeFiles.map(_.stripPrefix(s"$dir/"))
    val rows = SnapshotTable.readRows(dir, version).map { rs =>
      val byFile = SnapshotTable.manifestFiles(dir, version).zip(rs).toMap
      rel.flatMap(byFile.get).sum
    }.flatMap { physical =>
      // merge-on-read: recorded counts are physical rows; exact when
      // every dirty file is planned (subtract the live tombstones),
      // declined when pruning split the dirty set (per-file tombstone
      // counts are not recorded — never hand the optimizer a guess)
      if (dirtyRel.isEmpty) Some(physical)
      else if (dirtyRel.subsetOf(rel.toSet))
        Some(physical - SnapshotTable.readNdel(dir, version))
      else None
    }
    def statLen(p: String): Option[Long] =
      try {
        SnapshotScan.fsStatCalls.incrementAndGet()
        Some(SnapshotSource.fs(p).getFileStatus(new Path(p)).getLen)
      } catch { case scala.util.control.NonFatal(_) => None }
    val each = activeFiles.map(p => fileSizes.get(p).orElse(statLen(p)))
    // decline, never guess: one unknown file makes the byte total
    // unknown (a partial sum would under-estimate and could flip a
    // join strategy the wrong way)
    val bytes: Option[Long] =
      if (each.forall(_.isDefined)) Some(each.flatten.sum) else None
    val fullWidth = math.max(1, tableSchemaWidth)
    val scaled = bytes.map(b => math.max(1L,
      (b * math.min(fullWidth, requiredWidth)) / fullWidth))
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        scaled.fold(java.util.OptionalLong.empty())(
          java.util.OptionalLong.of)
      override def numRows(): java.util.OptionalLong =
        rows.fold(java.util.OptionalLong.empty())(
          java.util.OptionalLong.of)
    }
  }
  private def width(st: StructType): Int =
    st.fields.map(_.dataType.defaultSize).sum
  private lazy val tableSchemaWidth: Int = width(
    SnapshotTable.readSchema(dir, version).getOrElse(required))
  private lazy val requiredWidth: Int = width(required)
  override def createReaderFactory(): PartitionReaderFactory =
    if (changeFeed) new CdfReaderFactory(required)
    // Spark refuses MIXED row/columnar partitions in one scan: when any
    // planned file is merge-on-read dirty (position-filtered = row
    // path), the whole scan reads row-based. Dirty files are the
    // transient exception — compaction folds them back and the scan
    // re-vectorizes; a pruned scan that skips every dirty file keeps
    // the columnar path even before that.
    else new SnapshotReaderFactory(required, vectorized &&
      !activeFiles.exists(f =>
        dirtyRel.contains(f.stripPrefix(s"$dir/"))),
      SnapshotSource.sessionReadConfs())
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    // startingTimestamp resolves AT STREAM START to the earliest
    // version committed at or after t (Delta's option, borrowed with
    // its semantics like startingVersion was) — from there on, offsets
    // are versions exactly as with an explicit startingVersion
    new SnapshotMicroBatchStream(dir, required,
      startingVersion.orElse(startingTimestamp.map(
        SnapshotTable.resolveStartingTimestamp(dir, _))),
      ignoreRewrites, vectorized, changeFeed,
      SnapshotTable.readSchema(dir, version)
        .map(_.fieldNames.toSeq).getOrElse(Nil))
}

/** Offset = a snapshot VERSION — the log is already a totally-ordered
  * changelog, so stream progress is just "versions consumed". */
case class SnapshotVersionOffset(v: Int) extends StreamingOffset {
  override def json(): String = v.toString
}

/** STREAMING SOURCE over the snapshot log — `spark.readStream
  * .format("graft.sources.SnapshotSource").load(dir)` feeds each
  * APPEND commit as a micro-batch (the incremental-consumer pattern:
  * a downstream training-data refresh tails the table instead of
  * rescanning it; Delta's streaming source contract). A batch's rows
  * are exactly the files the manifest ADDED in (start, end] — set
  * difference of manifests, never directory listings, and carried-
  * forward files are never re-read.
  *
  * The FIRST offset (no checkpoint yet) defaults to the LATEST version
  * at stream start — tail the table, don't replay 100 TB of history;
  * `.option("startingVersion", v)` replays from version `v` INCLUSIVE
  * instead — the Delta convention for the identically-named option
  * (this log's versions start at 1, so both `0` and `1` mean the whole
  * history). A borrowed option name with shifted semantics is an
  * off-by-one footgun for anyone porting a Delta pipeline, so the
  * semantics are borrowed with the name.
  * `.option("startingTimestamp", tMillis)` is the wall-clock spelling
  * (Delta's other option, same semantics): replay from the EARLIEST
  * version committed at or after t
  * ([[graft.io.SnapshotTable.resolveStartingTimestamp]] — a timestamp
  * past the latest commit refuses loudly rather than silently tailing,
  * and the two starting options are mutually exclusive).
  * Non-append versions (overwrite, CoW DELETE/UPDATE/MERGE rewrites,
  * compaction) rewrite history, which an append feed cannot represent:
  * they fail LOUDLY naming the way out — the same refusal Delta makes
  * without ignoreChanges — unless `.option("ignoreRewrites", true)` is
  * set, which SKIPS the rewrite version (its file set becomes the new
  * set-difference base, so appends after it feed normally; rows
  * rewritten in it are silently not re-fed — the caller has declared
  * that acceptable). The one rewrite that is NOT a rewrite:
  * an `overwrite` as version 1 (a first commit in overwrite mode is
  * semantically the initial append) always feeds. The CDC view (q161)
  * remains the operator for change-consuming readers. Offsets are
  * version numbers, so restart-from-checkpoint resumes mid-log for
  * free. */
class SnapshotMicroBatchStream(dir: String, required: StructType,
                               startingVersion: Option[Int] = None,
                               ignoreRewrites: Boolean = false,
                               vectorized: Boolean = true,
                               changeFeed: Boolean = false,
                               tableNames: Seq[String] = Nil)
    extends MicroBatchStream {
  /** Current→written name map for files committed at `v`: a running
    * stream keeps its START-schema names across a rename (positions
    * are stable), so files written after the rename remap. Empty on
    * never-renamed tables — names coincide. */
  private def renamesAt(v: Int): Map[String, String] =
    if (tableNames.isEmpty) Map.empty
    else SnapshotTable.readSchema(dir, v).fold(
      Map.empty[String, String])(sv =>
      tableNames.zip(sv.fieldNames.toSeq)
        .filter { case (a, b) => a != b }.toMap)
  override def initialOffset(): StreamingOffset =
    // startingVersion=v feeds FROM v (offsets are exclusive lower
    // bounds, so inclusive-of-v means positioning at v-1; clamped for
    // v=0, which Delta users type for "everything")
    SnapshotVersionOffset(startingVersion.map(v => math.max(v - 1, 0))
      .getOrElse(SnapshotTable.versions(dir).lastOption.getOrElse(0)))
  override def latestOffset(): StreamingOffset =
    SnapshotVersionOffset(SnapshotTable.versions(dir).lastOption.getOrElse(0))
  override def deserializeOffset(json: String): StreamingOffset =
    SnapshotVersionOffset(json.trim.toInt)
  override def planInputPartitions(start: StreamingOffset,
                                   end: StreamingOffset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[SnapshotVersionOffset].v
    val until = end.asInstanceOf[SnapshotVersionOffset].v
    // positioned BELOW the retention horizon (a vacuum removed versions
    // this stream still needs): fail loudly naming the cause — feeding
    // from the oldest retained version instead would silently skip
    // rows, the unforgivable streaming failure
    val oldest = SnapshotTable.versions(dir).headOption.getOrElse(1)
    if (from + 1 < oldest && until >= from + 1)
      throw new IllegalStateException(
        s"stream positioned at version ${from + 1} below the retention " +
          s"horizon of $dir (oldest retained: v$oldest) — the versions " +
          "it needs were vacuumed; restart from a fresh checkpoint or " +
          s"startingVersion >= $oldest")
    if (changeFeed)
      return ((from + 1) to until).flatMap(v =>
        cdfPartitions(v)).toArray[InputPartition]
    ((from + 1) to until).flatMap { v =>
      val action = SnapshotTable.readAction(dir, v)
      val feeds = action == "append" ||
        (action == "overwrite" && v == 1) || // initial commit in overwrite mode
        action == "rename" // metadata-only: adds no files, feeds empty
      if (!feeds && !ignoreRewrites)
        throw new IllegalStateException(
          s"version $v is '$action': the streaming source feeds " +
            "append-only logs — skip rewrite versions with " +
            ".option(\"ignoreRewrites\", true) (rows they rewrote are " +
            "not re-fed), or consume changes through the CDC view")
      if (!feeds) Seq.empty // skipped rewrite: next append diffs against it
      else {
        val prev: Set[String] =
          if (v == 1) Set.empty
          else SnapshotTable.manifestFiles(dir, v - 1).toSet
        val ren = renamesAt(v)
        SnapshotTable.manifestFiles(dir, v).filterNot(prev)
          .map(f => SnapshotFilePartition(s"$dir/$f", renames = ren))
      }
    }.toArray[InputPartition]
  }
  private def cdfPartitions(v: Int): Seq[InputPartition] =
    SnapshotCdf.partitions(dir, v, tableNames)

  override def createReaderFactory(): PartitionReaderFactory =
    if (changeFeed) new CdfReaderFactory(required)
    else new SnapshotReaderFactory(required, vectorized,
      SnapshotSource.sessionReadConfs())
  override def commit(end: StreamingOffset): Unit = ()
  override def stop(): Unit = ()
}

/** One change-feed file: a data file read under a CONSTANT change type
  * (append/metadata-delete versions) or a DML sidecar whose
  * `_change_type` lives in the file bytes (`changeType = None`);
  * `version` is spliced in as `_commit_version` either way. */
case class CdfFilePartition(path: String, changeType: Option[String],
                            version: Long,
                            renames: Map[String, String] = Map.empty)
    extends InputPartition

/** Change-feed planning shared by the STREAMING source, the SQL
  * `CALL changes(...)` procedure, and the batch API
  * ([[graft.io.SnapshotTable.readChangeFeed]] derives its per-version
  * file sets here — ONE classification, so the three read paths cannot
  * drift): appends feed their added files as constant-'insert'
  * partitions, CoW DML feeds its recorded `_changes` sidecar (change
  * type lives in the file bytes), metadata partition deletes feed the
  * dropped files as constant-'delete' partitions, rewrite-only
  * maintenance feeds nothing. A DML version without a sidecar — or an
  * overwrite/restore — fails loudly: a silently wrong feed is the
  * unforgivable failure. */
private[graft] object SnapshotCdf {
  /** `curNames` = the data-column names the feed CONSUMER sees (its
    * end-version/stream-start schema, in position order). When the
    * log holds column renames, each emitted partition carries the
    * current→written map for its file so the reader factory remaps —
    * files written at `v` use `v`'s open-epoch names, files DROPPED
    * at `v` (metadata delete) use the epoch their manifest recorded.
    * Empty `curNames` (the batch API, which renames frames itself)
    * attaches nothing. */
  def partitions(dir: String, v: Int,
                 curNames: Seq[String] = Nil): Seq[CdfFilePartition] = {
    val action = SnapshotTable.readAction(dir, v)
    val files = SnapshotTable.manifestFiles(dir, v)
    // names files committed AT v carry (sidecars and appended files):
    // the consumer's end-version names may differ from v's even when v
    // itself predates every rename — compare NAMES, never epochs
    lazy val atV: Map[String, String] =
      if (curNames.isEmpty) Map.empty
      else SnapshotTable.readSchema(dir, v).fold(
        Map.empty[String, String])(sv =>
        curNames.zip(sv.fieldNames.toSeq)
          .filter { case (a, b) => a != b }.toMap)
    // per-file written names for members of manifest v-1 (the dropped
    // files of a metadata delete may predate any number of renames)
    lazy val atPrevOf: String => Map[String, String] =
      if (curNames.isEmpty) _ => Map.empty
      else {
        val pv = v - 1
        val eps = SnapshotTable.readEpochs(dir, pv)
        val open: Map[String, String] =
          SnapshotTable.readSchema(dir, pv).fold(
            Map.empty[String, String])(sv =>
            curNames.zip(sv.fieldNames.toSeq)
              .filter { case (a, b) => a != b }.toMap)
        if (eps.isEmpty) _ => open
        else {
          val cur = SnapshotTable.readSchema(dir, pv).get
          val se = SnapshotTable.manifestFiles(dir, pv)
            .zip(SnapshotTable.readSepoch(dir, pv)).toMap
          val byEpoch = eps.indices.map { e =>
            curNames.zip(SnapshotTable.epochNames(cur, eps, e))
              .filter { case (a, b) => a != b }.toMap
          }
          f => se.get(f).filter(_ < eps.length)
            .map(byEpoch).getOrElse(open)
        }
      }
    // a vacuumed v-1 means v's file-level delta is NOT derivable —
    // diffing against an empty base would feed every carried-forward
    // file as 'insert', silently duplicating history into the feed.
    // Evaluated LAZILY: sidecar-recorded DML never needs the diff, so
    // it keeps feeding even at the retention horizon.
    lazy val prevFiles: Seq[String] =
      if (v == 1) Seq.empty
      else if (!SnapshotTable.versions(dir).contains(v - 1))
        throw new IllegalStateException(
          s"version ${v - 1} of $dir was vacuumed — version $v's " +
            s"row-level delta is not derivable; start the feed above v$v")
      else SnapshotTable.manifestFiles(dir, v - 1)
    lazy val added = files.filterNot(prevFiles.toSet)
    lazy val removed = prevFiles.filterNot(files.toSet)
    action match {
      case _ if !SnapshotTable.isDataChange(dir, v) =>
        Seq.empty // rewrite-only maintenance: no logical change
      case "append" =>
        added.map(f => CdfFilePartition(s"$dir/$f", Some("insert"), v, atV))
      case "overwrite" if v == 1 =>
        added.map(f => CdfFilePartition(s"$dir/$f", Some("insert"), v, atV))
      case "compact" => Seq.empty // rewrite-only: no logical change
      case "delete" | "update" | "merge" =>
        val sidecar = SnapshotTable.changeFiles(dir, v)
        if (sidecar.nonEmpty)
          sidecar.map(f => CdfFilePartition(f, None, v, atV))
        else if (action == "delete" && added.isEmpty) {
          // METADATA partition delete: the dropped files' rows ARE the
          // deleted rows — unless a dropped file carried positional
          // deletes, in which case its LOGICAL rows differ from its
          // bytes and a constant-partition read would resurrect
          // tombstoned rows into the feed. Refuse that edge loudly.
          val prevDirty = SnapshotTable.readDirty(dir, v - 1).toSet
          val droppedDirty = removed.filter(prevDirty)
          if (droppedDirty.nonEmpty) throw new IllegalStateException(
            s"version $v drops partition files with positional " +
              s"deletes (${droppedDirty.mkString(", ")}) — their " +
              "row-level delta is not derivable from file bytes; " +
              s"start the feed above v$v")
          removed.map(f =>
            CdfFilePartition(s"$dir/$f", Some("delete"), v, atPrevOf(f)))
        }
        else if (added.isEmpty && removed.isEmpty &&
            SnapshotTable.readDeletes(dir, v) ==
              SnapshotTable.readDeletes(dir, v - 1) &&
            SnapshotTable.readNdel(dir, v) ==
              SnapshotTable.readNdel(dir, v - 1))
          // no-op DML (matched nothing): files AND positional-delete
          // state unchanged — no rows changed. A MoR delete changes no
          // files but DOES change the sidecar set, so it must not fall
          // in here (it either recorded a CDF sidecar or refuses below)
          Seq.empty
        else throw new IllegalStateException(
          s"version $v is '$action' but recorded no change sidecar — " +
            "call SnapshotTable.enableChangeFeed BEFORE the DML, or " +
            s"start the feed above v$v")
      case other => throw new IllegalStateException(
        s"version $v is '$other': the change feed covers append, DML " +
          "and compaction commits — an overwrite/restore's row-level " +
          "delta is not derivable")
    }
  }

  /** The feed's read schema: the table's columns plus the change
    * metadata. */
  def schemaOf(tableSchema: StructType): StructType =
    StructType(tableSchema.fields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
}


/** Reader for change-feed partitions: the parquet bytes provide the
  * data columns (plus `_change_type` for sidecars), the wrapper
  * splices the constants — same pattern as the `_file` metadata
  * column. Row path only: feed batches are commit-sized deltas, not
  * scan-bound table reads. */
class CdfReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdfFilePartition]
    val ctIdx = required.fieldNames.indexOf("_change_type")
    val cvIdx = required.fieldNames.indexOf("_commit_version")
    val spliceCt = ctIdx >= 0 && p.changeType.isDefined
    val fileSchema = StructType(required.zipWithIndex.collect {
      case (f, i) if i != cvIdx && !(i == ctIdx && spliceCt) => f
    })
    val base = new ParquetGroupReader(p.path,
      SnapshotRename.phys(fileSchema, p.renames))
    if (ctIdx < 0 && cvIdx < 0) base
    else new PartitionReader[InternalRow] {
      private val ctVal =
        p.changeType.map(UTF8String.fromString).orNull
      override def next(): Boolean = base.next()
      override def get(): InternalRow = {
        val r = base.get()
        val out = new GenericInternalRow(required.length)
        var i = 0
        var j = 0
        while (i < required.length) {
          if (i == cvIdx) out.update(i, p.version)
          else if (i == ctIdx && spliceCt) out.update(i, ctVal)
          else {
            out.update(i, r.get(j, required(i).dataType))
            j += 1
          }
          i += 1
        }
        out
      }
      override def close(): Unit = base.close()
    }
  }
}

/** One reader task's byte range of one data file. `length = -1` means
  * the whole file (the un-split fast path — no status RPC was paid for
  * it, so the end offset is unknown and unneeded). `partKey` is the
  * file's TYPED partition tuple when the table is hive-partitioned
  * (files are value-pure, so every split of a file shares it) — the
  * [[org.apache.spark.sql.connector.read.HasPartitionKey]] half of the
  * storage-partitioned-join contract; null on unpartitioned scans,
  * where the scan never reports `KeyGroupedPartitioning` and Spark
  * never asks. */
case class SnapshotFilePartition(path: String, start: Long = 0L,
                                 length: Long = -1L,
                                 partKey: InternalRow = null,
                                 relPath: String = null,
                                 delFiles: Seq[String] = Nil,
                                 renames: Map[String, String] = Map.empty)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = partKey
}

private[sources] object SnapshotRename {
  /** The requested schema with each field renamed to THIS file's
    * physical (written) name — the executor-side half of column-id
    * renames: a file written before a rename stores the old name, the
    * batch columns are positional, so reading the right physical
    * column under the requested slot is all there is to it. */
  def phys(st: StructType, renames: Map[String, String]): StructType =
    if (renames.isEmpty) st
    else StructType(st.fields.map(f =>
      renames.get(f.name).fold(f)(n => f.copy(name = n))))
}

class SnapshotReaderFactory(required: StructType,
                            vectorized: Boolean = false,
                            readConfs: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  // `_file` metadata column: constant per partition — the parquet
  // readers see only the data columns, the wrapper splices the path in
  private val fileIdx = required.fieldNames.indexOf("_file")
  private val dataSchema =
    if (fileIdx < 0) required
    else StructType(required.filterNot(_.name == "_file"))
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SnapshotFilePartition]
    val raw = new ParquetGroupReader(p.path,
      SnapshotRename.phys(dataSchema, p.renames), p.start, p.length)
    // merge-on-read dirty file: skip its positionally-deleted rows
    // (sequential whole-file read => the running counter IS the
    // absolute row index)
    val base =
      if (p.delFiles.isEmpty) raw
      else new PositionFilteredReader(raw,
        SnapshotSource.deletedPositions(p.delFiles, p.relPath))
    if (fileIdx < 0) base
    else new PartitionReader[InternalRow] {
      private val path = UTF8String.fromString(p.path)
      override def next(): Boolean = base.next()
      override def get(): InternalRow = {
        val r = base.get()
        val out = new GenericInternalRow(required.length)
        var i = 0
        var j = 0
        while (i < required.length) {
          if (i == fileIdx) out.update(i, path)
          else {
            out.update(i,
              if (r.isNullAt(j)) null else r.get(j, dataSchema(j).dataType))
            j += 1
          }
          i += 1
        }
        out
      }
      override def close(): Unit = base.close()
    }
  }
  // VECTORIZED read path: Spark's own columnar parquet reader (the
  // engine behind every native parquet scan — decodes straight into
  // ColumnVectors, ~5-10x the record-at-a-time Group assembly on wide
  // scans) driven through the DSv2 columnar seam. Missing columns
  // null-fill inside the reader (Spark's native schema-evolution
  // mechanics — the same contract as the row path), and the zero-column
  // count(*) projection produces empty batches with row counts. The
  // row path stays as the `.option("vectorizedRead", false)` escape and
  // the spec's parity baseline.
  override def supportColumnarReads(partition: InputPartition): Boolean =
    vectorized && fileIdx < 0 && (partition match {
      case f: SnapshotFilePartition => f.delFiles.isEmpty // dirty: row path
      case _ => true
    })
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[SnapshotFilePartition]
    new SnapshotColumnarReader(p.path,
      SnapshotRename.phys(required, p.renames), p.start, p.length,
      readConfs)
  }
}

/** Columnar partition reader: one [[SnapshotFilePartition]] byte range
  * through `VectorizedParquetRecordReader` (public Spark class; same
  * midpoint-in-range row-group assignment as the row path, so split
  * grids stay exactly-once). The requested Catalyst schema rides the
  * Hadoop conf key the reader contractually expects
  * (`ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA`); rebase modes are
  * CORRECTED — the snapshot writer only emits modern
  * TIMESTAMP(MICROS)/DATE logical types. */
class SnapshotColumnarReader(path: String, required: StructType,
                             start: Long, length: Long,
                             readConfs: Map[String, String] = Map.empty)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.hadoop.mapred.FileSplit // the old-API split Spark's reader base casts to
  import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
  import org.apache.hadoop.mapreduce.TaskAttemptID
  import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader

  private val reader = {
    val conf = SnapshotSource.newConf()
    conf.set("org.apache.spark.sql.parquet.row.requested_schema",
      required.json)
    conf.set("parquet.read.support.class",
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    // the session confs Spark's scan planner copies into the hadoop conf
    // for its own parquet readers (the schema converter reads them with
    // no defaults): captured driver-side at scan build
    // ([[SnapshotSource.sessionReadConfs]]) so a non-default session
    // reads identically here and on a native parquet scan; the
    // fallbacks only cover a factory built without a session (tests)
    conf.set("spark.sql.parquet.binaryAsString",
      readConfs.getOrElse("spark.sql.parquet.binaryAsString", "false"))
    conf.set("spark.sql.parquet.int96AsTimestamp",
      readConfs.getOrElse("spark.sql.parquet.int96AsTimestamp", "true"))
    conf.set("spark.sql.caseSensitive",
      readConfs.getOrElse("spark.sql.caseSensitive", "false"))
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled",
      readConfs.getOrElse(
        "spark.sql.parquet.inferTimestampNTZ.enabled", "true"))
    conf.set("spark.sql.legacy.parquet.nanosAsLong",
      readConfs.getOrElse("spark.sql.legacy.parquet.nanosAsLong", "false"))
    val len =
      if (length >= 0) length
      else SnapshotSource.fs(path).getFileStatus(new Path(path)).getLen
    val split = new FileSplit(new Path(path), start, len,
      Array.empty[String])
    // session timezone drives INT96 conversion only (the snapshot
    // writer never emits INT96); rebase stays CORRECTED — modern types
    val tz = readConfs.getOrElse("spark.sql.session.timeZone", "UTC")
    val r = new VectorizedParquetRecordReader(
      java.time.ZoneId.of(tz), "CORRECTED", tz, "CORRECTED", tz,
      /* useOffHeap = */ false, /* capacity = */ 4096)
    r.initialize(split, new TaskAttemptContextImpl(conf, new TaskAttemptID()))
    r.initBatch(new StructType(), InternalRow.empty)
    r.enableReturningBatches()
    r
  }
  override def next(): Boolean = reader.nextBatch()
  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
    reader.resultBatch()
  override def close(): Unit = reader.close()
}

/** Skips the positionally-deleted rows of a MERGE-ON-READ dirty file:
  * wraps the sequential whole-file row reader with a running row
  * counter (which IS parquet's absolute row index on an unsplit,
  * non-skipping read) and a sorted-array binary search per row. The
  * delete set is loaded once at open ([[SnapshotSource
  * .deletedPositions]]) — sidecars are point-delete-sized by design,
  * and compaction folds dirty files back to the vectorized path. */
class PositionFilteredReader(base: PartitionReader[InternalRow],
                             deleted: Array[Long])
    extends PartitionReader[InternalRow] {
  private var pos = -1L
  override def next(): Boolean = {
    while (base.next()) {
      pos += 1
      if (java.util.Arrays.binarySearch(deleted, pos) < 0) return true
    }
    false
  }
  override def get(): InternalRow = base.get()
  override def close(): Unit = base.close()
}

/** Executor-side parquet record reader over the PUBLIC parquet-hadoop
  * API: footer → projected row groups → assembled [[Group]] records →
  * InternalRow. Columns requested but absent from THIS file (schema
  * evolution: the file predates the column) null-fill, which is the
  * manifest schema's read-time contract. An empty projection (count(*)
  * plans zero columns) short-circuits to emitting `recordCount` empty
  * rows without touching any page. A byte range (`length >= 0`) limits
  * the reader
  * to the row groups whose MIDPOINT falls inside [start, start+length)
  * — the parquet-hadoop range contract [[SnapshotScan.split]] tiles
  * against, so a split file's groups partition exactly across tasks
  * (`getRecordCount`/`getRowGroups` already respect the range, which
  * keeps the empty-projection path split-correct for free). */
class ParquetGroupReader(path: String, required: StructType,
                         start: Long = 0L, length: Long = -1L)
    extends PartitionReader[InternalRow] {
  private val reader = {
    val in = HadoopInputFile.fromPath(new Path(path),
      SnapshotSource.newConf())
    if (length < 0) ParquetFileReader.open(in)
    else ParquetFileReader.open(in,
      org.apache.parquet.HadoopReadOptions.builder(in.getConfiguration)
        .withRange(start, start + length).build())
  }
  private val fileSchema: MessageType =
    reader.getFooter.getFileMetaData.getSchema
  private val present = required.fields.filter(f =>
    fileSchema.containsField(f.name))
  private val projected: Option[MessageType] =
    if (present.isEmpty) None
    else {
      val m = new MessageType(fileSchema.getName,
        present.map(f =>
          fileSchema.getType(fileSchema.getFieldIndex(f.name))): _*)
      reader.setRequestedSchema(m)
      Some(m)
    }
  private var emptyRowsLeft: Long =
    if (projected.isEmpty) reader.getRecordCount else 0L

  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var remaining = 0L
  private var current: InternalRow = _

  override def next(): Boolean = projected match {
    case None =>
      // no requested column exists in this file: either a bare count(*)
      // projection (zero columns) or every requested column postdates
      // the file (schema evolution) — emit recordCount rows of nulls at
      // the REQUIRED width, never touching a page
      if (emptyRowsLeft <= 0) false
      else {
        emptyRowsLeft -= 1
        current = new GenericInternalRow(required.length)
        true
      }
    case Some(msg) =>
      while (remaining <= 0) {
        val pages = reader.readNextRowGroup()
        if (pages == null) return false
        remaining = pages.getRowCount
        recordReader = new ColumnIOFactory().getColumnIO(msg)
          .getRecordReader(pages, new GroupRecordConverter(msg))
      }
      remaining -= 1
      current = convert(recordReader.read())
      true
  }

  private def convert(g: Group): InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val f = required(i)
      vals(i) =
        if (!fileSchema.containsField(f.name) ||
          g.getFieldRepetitionCount(f.name) == 0) null
        else value(g, g.getType.getFieldIndex(f.name), 0, f.dataType)
      i += 1
    }
    new GenericInternalRow(vals)
  }

  /** One assembled value out of the example `Group`, recursing through
    * the standard nested layouts ([[SnapshotWrite.parquetType]]):
    * LIST → `list` wrappers each holding an optional `element`, MAP →
    * repeated `key_value` pairs, struct → positional fields (nested
    * shapes are written whole — top-level columns are the evolution
    * unit, so positions inside a nested group are stable). */
  private def value(g: Group, idx: Int, pos: Int, dt: DataType): Any =
    dt match {
      case LongType | TimestampType => g.getLong(idx, pos)
      case IntegerType | DateType => g.getInteger(idx, pos)
      case DoubleType => g.getDouble(idx, pos)
      case FloatType => g.getFloat(idx, pos)
      case BooleanType => g.getBoolean(idx, pos)
      case StringType => UTF8String.fromString(g.getString(idx, pos))
      case BinaryType => g.getBinary(idx, pos).getBytes
      case ArrayType(et, _) =>
        val lg = g.getGroup(idx, pos)
        val n = lg.getFieldRepetitionCount(0)
        val out = new Array[Any](n)
        var j = 0
        while (j < n) {
          val w = lg.getGroup(0, j)
          out(j) =
            if (w.getFieldRepetitionCount(0) == 0) null
            else value(w, 0, 0, et)
          j += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      case MapType(kt, vt, _) =>
        val mg = g.getGroup(idx, pos)
        val n = mg.getFieldRepetitionCount(0)
        val ks = new Array[Any](n)
        val vs = new Array[Any](n)
        var j = 0
        while (j < n) {
          val kv = mg.getGroup(0, j)
          ks(j) = value(kv, 0, 0, kt)
          vs(j) =
            if (kv.getFieldRepetitionCount(1) == 0) null
            else value(kv, 1, 0, vt)
          j += 1
        }
        new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(ks),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(vs))
      case st: StructType =>
        val sg = g.getGroup(idx, pos)
        val out = new Array[Any](st.length)
        var j = 0
        while (j < st.length) {
          out(j) =
            if (sg.getFieldRepetitionCount(j) == 0) null
            else value(sg, j, 0, st(j).dataType)
          j += 1
        }
        new GenericInternalRow(out)
      case other => throw new IllegalArgumentException(
        s"unsupported snapshot column type $other")
    }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** DSv2 WRITE surface — `df.write.format("graft.sources.SnapshotSource")
  * .mode("append"|"overwrite").save(dir)` commits through the snapshot
  * log's CAS protocol, so SQL writers get the same atomic-visibility /
  * time-travel / schema-evolution contract as
  * [[graft.io.SnapshotTable.commit]]:
  *
  *  - executors stage one parquet file per non-empty partition under a
  *    unique `data/w<uuid>` sub-directory (the direct
  *    [[SnapshotWriteSupport]] InternalRow→RecordConsumer path — no
  *    per-row Group assembly); nothing is visible until the manifest
  *    publishes;
  *  - `.option("statsCol", c)` folds per-file (min, max) of a long/int
  *    column INTO the writers while rows stream — the manifest stats
  *    tier (q154/q214 pruning) costs no post-hoc job;
  *  - commit() hands the staged file list + stats + declared schema to
  *    [[SnapshotTable.commitStagedFiles]], which evolves the schema
  *    (add-column only), carries prior files on append, and CAS-links
  *    the manifest — a racing writer fails loudly, never clobbers;
  *  - abort() deletes the staged files; an all-empty write stages one
  *    zero-row schema-bearing file driver-side (the table stays
  *    readable, the [[SnapshotTable.delete]] convention).
  *
  * SaveMode.Overwrite arrives as the TRUNCATE capability (Spark lowers
  * overwrite-by-true to truncate), mapping to the log's `overwrite`
  * action. */
class SnapshotWriteBuilder(dir: String, writeSchema: StructType,
                           statsCol: Option[String],
                           partitionBy: Option[String], queryId: String)
    extends WriteBuilder with SupportsTruncate {
  // `.option("statsCol", "a")` or `.option("statsCol", "a,b")` — a
  // comma-separated list tracks min/max for every named column (the
  // multi-column manifest stats tier); the first is the primary
  private val statsCols: Seq[String] =
    statsCol.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }

  /** The PARTITIONING this write commits under: appends to an existing
    * partitioned table INHERIT its columns (an explicit
    * `.option("partitionBy", ...)` must then match — a silent layout
    * fork would half-state the manifest); overwrites and first commits
    * take the option (comma-separated). Writers route rows into one
    * value-pure file per tuple, so the manifest records exact values —
    * the full partition tier (pruning, metadata DELETE) now works
    * through plain `df.write`/`writeStream` with no API calls. */
  private def resolvedPartCols(ow: Boolean): Seq[String] = {
    val opt = partitionBy.toSeq.flatMap(_.split(','))
      .map(_.trim).filter(_.nonEmpty)
    val prevP =
      if (SnapshotTable.versions(dir).isEmpty) Nil
      else SnapshotTable.partitionColumns(dir,
        SnapshotTable.resolveVersion(dir))
    val cols =
      if (ow || prevP.isEmpty) opt
      else {
        require(opt.isEmpty || opt == prevP,
          s"write partitioned by [${opt.mkString(",")}] onto a table " +
            s"partitioned by [${prevP.mkString(",")}] — appends keep " +
            "the table's partitioning; only overwrite repartitions")
        prevP
      }
    SnapshotTable.validatePartCols(writeSchema, cols)
    cols
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new SnapshotBatchWrite(dir, writeSchema, overwrite, statsCols,
        resolvedPartCols(overwrite))
    override def toStreaming: StreamingWrite = {
      require(!overwrite,
        "snapshot streaming sink supports outputMode=append only")
      new SnapshotStreamingWrite(dir, writeSchema, statsCols,
        resolvedPartCols(ow = false), queryId)
    }
  }
}

/** STREAMING sink — `stream.writeStream
  * .format("graft.sources.SnapshotSource").start(dir)`: every
  * micro-batch epoch is ONE append commit (atomic per-batch visibility;
  * every intermediate version time-travelable; per-batch cost flat in
  * table size — the q153 lakehouse-ingest contract, now native instead
  * of foreachBatch). EXACTLY-ONCE under sink retries: the
  * (streaming-query id, epoch id) PAIR is recorded in the manifest's
  * action field, and a replayed epoch that already committed is
  * detected via [[SnapshotTable.committedEpochs]] and skipped — the
  * txnAppId+version pairing Delta uses. The query id matters: a SECOND
  * streaming query (fresh checkpoint) writing to the same table
  * restarts at epoch 0, which must NOT collide with another query's
  * committed epoch 0 — deduping on the epoch alone would silently drop
  * its batches. An all-empty epoch commits nothing (no empty-version
  * litter). */
class SnapshotStreamingWrite(dir: String, writeSchema: StructType,
                             statsCols: Seq[String],
                             partCols: Seq[String], queryId: String)
    extends StreamingWrite {
  def this(dir: String, writeSchema: StructType, statsCols: Seq[String],
           queryId: String) =
    this(dir, writeSchema, statsCols, Nil, queryId)
  private val sub = s"data/s${java.util.UUID.randomUUID().toString.take(8)}"
  private val statsIdxs = SnapshotWrite.statsIndexes(writeSchema, statsCols)
  private val partIdxs = SnapshotWrite.statsIndexes(writeSchema, partCols)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new SnapshotStreamingWriterFactory(dir, sub, writeSchema, statsIdxs,
      partIdxs)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: SnapshotCommitMsg => m }
      .flatMap(_.files).sortBy(_.relPath)
    if (msgs.isEmpty) return // empty epoch: no version
    if (SnapshotTable.committedEpochs(dir, queryId).contains(epochId)) {
      // replayed epoch whose commit landed: exactly-once means DROP the
      // re-staged files, not re-append them
      msgs.foreach(m => SnapshotSource.deleteQuiet(s"$dir/${m.relPath}"))
      return
    }
    val stats = statsCols.zipWithIndex.map { case (c, i) =>
      (c, msgs.toSeq.map(m =>
        if (m.rows == 0L || m.mns(i) == Long.MaxValue)
          (Long.MaxValue, Long.MinValue) // empty/all-null: always-prune
        else (m.mns(i), m.mxs(i))))
    }
    val nulls = statsCols.zipWithIndex.map { case (c, i) =>
      (c, msgs.toSeq.map(m => if (m.nulls.isEmpty) 0L else m.nulls(i)))
    }
    val parts =
      if (partCols.isEmpty) None
      else Some((partCols, msgs.toSeq.map(_.pvals)))
    SnapshotTable.commitStagedFiles(dir, msgs.toSeq.map(_.relPath),
      writeSchema, overwrite = false, stats,
      txn = Some((queryId, epochId)), parts = parts, nulls = nulls)
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: SnapshotCommitMsg => m }
      .flatMap(_.files)
      .foreach(f => SnapshotSource.deleteQuiet(s"$dir/${f.relPath}"))
}

class SnapshotStreamingWriterFactory(dir: String, sub: String,
                                     schema: StructType,
                                     statsIdxs: Array[Int],
                                     partIdxs: Array[Int] = Array.empty,
                                     maxOpenWriters: Int =
                                       SnapshotWrite.defaultMaxOpenWriters)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new SnapshotDataWriter(dir, s"$sub/e$epochId", schema, statsIdxs,
      partIdxs, partitionId, taskId, maxOpenWriters)
}

object SnapshotWrite {
  /** Catalyst type → parquet type, the exact inverse of
    * [[SnapshotSource.footerSchema]] (all fields and nested values
    * optional — the snapshot tier records every column nullable; map
    * keys are the one required slot, Catalyst never nulls them).
    * Nested types take the STANDARD parquet layouts — 3-level
    * `LIST/list/element` and `MAP/key_value/{key,value}` — which is
    * what Spark's own parquet writer emits and both snapshot read
    * paths (vectorized and row) reassemble. */
  private[sources] def parquetType(name: String, dt: DataType,
      rep: ParquetType.Repetition = ParquetType.Repetition.OPTIONAL)
      : ParquetType = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    def prim(t: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName) =
      PTypes.primitive(t, rep)
    dt match {
      case LongType => prim(INT64).named(name)
      case TimestampType => prim(INT64).as(
        LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.MICROS)).named(name)
      case IntegerType => prim(INT32).named(name)
      case DateType =>
        prim(INT32).as(LogicalTypeAnnotation.dateType()).named(name)
      case DoubleType => prim(DOUBLE).named(name)
      case FloatType => prim(FLOAT).named(name)
      case BooleanType => prim(BOOLEAN).named(name)
      case StringType =>
        prim(BINARY).as(LogicalTypeAnnotation.stringType()).named(name)
      case BinaryType => prim(BINARY).named(name)
      case ArrayType(et, _) =>
        PTypes.buildGroup(rep)
          .as(LogicalTypeAnnotation.listType())
          .addField(PTypes.repeatedGroup()
            .addField(parquetType("element", et))
            .named("list"))
          .named(name)
      case MapType(kt, vt, _) =>
        PTypes.buildGroup(rep)
          .as(LogicalTypeAnnotation.mapType())
          .addField(PTypes.repeatedGroup()
            .addField(parquetType("key", kt,
              ParquetType.Repetition.REQUIRED))
            .addField(parquetType("value", vt))
            .named("key_value"))
          .named(name)
      case st: StructType =>
        st.fields.foldLeft(PTypes.buildGroup(rep)) { (g, f) =>
          g.addField(parquetType(f.name, f.dataType))
        }.named(name)
      case other => throw new IllegalArgumentException(
        s"unsupported snapshot column type $other for $name")
    }
  }

  private[sources] def messageType(schema: StructType): MessageType =
    new MessageType("spark_schema",
      schema.fields.map(f => parquetType(f.name, f.dataType)): _*)

  /** Resolve stats column names to schema indexes, loudly. */
  private[sources] def statsIndexes(schema: StructType,
                                    cols: Seq[String]): Array[Int] =
    cols.map { c =>
      val i = schema.fieldNames.indexOf(c)
      require(i >= 0, s"statsCol $c not in write schema"); i
    }.toArray

  /** Per-task open-writer cap for partitioned writes, read DRIVER-SIDE
    * from `spark.graft.maxOpenPartitionWriters` (each open writer
    * buffers a parquet row group; the cap turns the silent partitionBy
    * OOM into a loud, named error). */
  private[sources] def defaultMaxOpenWriters: Int =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.maxOpenPartitionWriters", "64").toInt
    catch { case scala.util.control.NonFatal(_) => 64 }
}

/** Direct `InternalRow` → parquet `RecordConsumer` write support — the
  * NATIVE write path that replaced the example-Group assembly: the
  * Group path allocated a `SimpleGroup` plus one boxed value per field
  * per row and re-dispatched on field NAME per add; this one emits
  * each primitive straight to the column writers through the public
  * `WriteSupport` API with zero per-row allocation on the flat path
  * (strings/binaries copy once out of the possibly-reused unsafe-row
  * buffer — parquet's dictionary encoder retains `Binary` references
  * past the call, so the bytes must be immutable). Per-type emitters
  * are resolved ONCE at construction into closures over
  * `SpecializedGetters` — rows, struct fields, array elements, and map
  * sides all share them, which is how nested values recurse without
  * re-dispatching on type per row. Nested values emit the standard
  * 3-level `LIST/list/element` and `MAP/key_value` shapes
  * [[SnapshotWrite.parquetType]] declares. */
private[sources] class SnapshotWriteSupport(schema: StructType)
    extends org.apache.parquet.hadoop.api.WriteSupport[InternalRow] {
  import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
  private val msg = SnapshotWrite.messageType(schema)
  private var consumer: org.apache.parquet.io.api.RecordConsumer = _

  private type VWriter = (SpecializedGetters, Int) => Unit

  private def immutableUtf8(g: SpecializedGetters, i: Int): Array[Byte] = {
    // getBytes copies unless the UTF8String spans its whole backing
    // array (never true inside a row buffer); the clone() guards the
    // spanning case — Binary must own immutable bytes
    val b = g.getUTF8String(i)
    val arr = b.getBytes
    if (b.getBaseObject.isInstanceOf[Array[Byte]] &&
        (b.getBaseObject eq arr)) arr.clone() else arr
  }

  private def writerFor(dt: DataType): VWriter = dt match {
    case LongType | TimestampType =>
      (g, i) => consumer.addLong(g.getLong(i))
    case IntegerType | DateType =>
      (g, i) => consumer.addInteger(g.getInt(i))
    case DoubleType => (g, i) => consumer.addDouble(g.getDouble(i))
    case FloatType => (g, i) => consumer.addFloat(g.getFloat(i))
    case BooleanType => (g, i) => consumer.addBoolean(g.getBoolean(i))
    case StringType => (g, i) =>
      consumer.addBinary(Binary.fromConstantByteArray(immutableUtf8(g, i)))
    case BinaryType => (g, i) =>
      consumer.addBinary(Binary.fromConstantByteArray(
        g.getBinary(i).clone()))
    case ArrayType(et, _) =>
      val ew = writerFor(et)
      (g, i) => {
        val arr = g.getArray(i)
        consumer.startGroup()
        val n = arr.numElements()
        if (n > 0) { // an EMPTY list is a group with no `list` field
          consumer.startField("list", 0)
          var j = 0
          while (j < n) {
            consumer.startGroup()
            if (!arr.isNullAt(j)) {
              consumer.startField("element", 0)
              ew(arr, j)
              consumer.endField("element", 0)
            }
            consumer.endGroup()
            j += 1
          }
          consumer.endField("list", 0)
        }
        consumer.endGroup()
      }
    case MapType(kt, vt, _) =>
      val kw = writerFor(kt)
      val vw = writerFor(vt)
      (g, i) => {
        val m = g.getMap(i)
        consumer.startGroup()
        val n = m.numElements()
        if (n > 0) {
          consumer.startField("key_value", 0)
          val ks = m.keyArray()
          val vs = m.valueArray()
          var j = 0
          while (j < n) {
            consumer.startGroup()
            consumer.startField("key", 0) // Catalyst map keys: never null
            kw(ks, j)
            consumer.endField("key", 0)
            if (!vs.isNullAt(j)) {
              consumer.startField("value", 1)
              vw(vs, j)
              consumer.endField("value", 1)
            }
            consumer.endGroup()
            j += 1
          }
          consumer.endField("key_value", 0)
        }
        consumer.endGroup()
      }
    case st: StructType =>
      val names = st.fieldNames
      val fws = st.fields.map(f => writerFor(f.dataType))
      (g, i) => {
        val row = g.getStruct(i, names.length)
        consumer.startGroup()
        var j = 0
        while (j < names.length) {
          if (!row.isNullAt(j)) {
            consumer.startField(names(j), j)
            fws(j)(row, j)
            consumer.endField(names(j), j)
          }
          j += 1
        }
        consumer.endGroup()
      }
    case other => throw new IllegalArgumentException(
      s"unsupported snapshot column type $other")
  }

  private val topNames = schema.fieldNames
  private val topWriters = schema.fields.map(f => writerFor(f.dataType))

  override def init(conf: Configuration)
      : org.apache.parquet.hadoop.api.WriteSupport.WriteContext =
    new org.apache.parquet.hadoop.api.WriteSupport.WriteContext(msg,
      java.util.Collections.emptyMap[String, String]())
  override def prepareForWrite(
      rc: org.apache.parquet.io.api.RecordConsumer): Unit = consumer = rc
  override def write(row: InternalRow): Unit = {
    consumer.startMessage()
    var i = 0
    while (i < topNames.length) {
      if (!row.isNullAt(i)) {
        consumer.startField(topNames(i), i)
        topWriters(i)(row, i)
        consumer.endField(topNames(i), i)
      }
      i += 1
    }
    consumer.endMessage()
  }
}

/** Streaming single-file parquet writer — rows go straight to the page
  * writers through [[SnapshotWriteSupport]] (nothing buffers beyond
  * parquet's own row groups), per-file stats fold as rows pass.
  * Shared by the executor [[SnapshotDataWriter]] and the driver-side
  * empty-commit fallback. */
private[sources] class ParquetGroupWriter(path: String, schema: StructType,
                                          statsIdxs: Array[Int]) {
  private val writer = {
    class B(f: HadoopOutputFile) extends org.apache.parquet.hadoop
        .ParquetWriter.Builder[InternalRow, B](f) {
      override def self(): B = this
      override def getWriteSupport(conf: Configuration)
          : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
        new SnapshotWriteSupport(schema)
    }
    new B(HadoopOutputFile.fromPath(new Path(path),
      SnapshotSource.newConf())).build()
  }
  // schema index -> stats slot (-1 = untracked); min/max fold per slot
  private val statSlot: Array[Int] = {
    val s = Array.fill(schema.length)(-1)
    statsIdxs.zipWithIndex.foreach { case (idx, slot) => s(idx) = slot }
    s
  }
  private val statTypes: Array[DataType] = schema.fields.map(_.dataType)
  val mns: Array[Long] = Array.fill(statsIdxs.length)(Long.MaxValue)
  val mxs: Array[Long] = Array.fill(statsIdxs.length)(Long.MinValue)
  val nulls: Array[Long] = Array.fill(statsIdxs.length)(0L)
  var rows: Long = 0L

  def write(row: InternalRow): Unit = {
    var s = 0
    while (s < statsIdxs.length) {
      val i = statsIdxs(s)
      // NULLs fold into the per-file null count (the IS NULL pruning
      // tier) and stay out of min/max — SQL min/max semantics; an
      // all-null file keeps the always-prune (MaxValue, MinValue)
      // sentinel, which no range predicate matches
      if (row.isNullAt(i)) nulls(s) += 1
      else {
        val v = statTypes(i) match {
          case LongType => row.getLong(i)
          case IntegerType => row.getInt(i).toLong
          case other => throw new IllegalArgumentException(
            s"statsCol must be long/int, got $other")
        }
        mns(s) = math.min(mns(s), v)
        mxs(s) = math.max(mxs(s), v)
      }
      s += 1
    }
    writer.write(row)
    rows += 1
  }

  def close(): Unit = writer.close()
}

/** One staged data file's commit record: path, per-stats-column
  * min/max folds, row count, and (on a partitioned write) the file's
  * partition-value tuple — files are VALUE-PURE because the writer
  * routes rows by tuple. */
case class SnapshotFileMsg(relPath: String, mns: Seq[Long],
                           mxs: Seq[Long], rows: Long,
                           pvals: Seq[Option[String]] = Seq.empty,
                           nulls: Seq[Long] = Seq.empty)

/** A writer task's commit message — a LIST of files: an unpartitioned
  * task stages at most one, a partitioned task one per partition tuple
  * it saw. */
case class SnapshotCommitMsg(files: Seq[SnapshotFileMsg])
    extends WriterCommitMessage

class SnapshotBatchWrite(dir: String, writeSchema: StructType,
                         overwrite: Boolean, statsCols: Seq[String],
                         partCols: Seq[String] = Nil)
    extends BatchWrite {
  // unique staging sub-dir: concurrent writers never collide on file
  // names, and nothing under data/ is live until a manifest names it
  private val sub = s"data/w${java.util.UUID.randomUUID().toString.take(8)}"
  private val statsIdxs = SnapshotWrite.statsIndexes(writeSchema, statsCols)
  private val partIdxs = SnapshotWrite.statsIndexes(writeSchema, partCols)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new SnapshotWriterFactory(dir, sub, writeSchema, statsIdxs, partIdxs)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: SnapshotCommitMsg => m }
      .flatMap(_.files).sortBy(_.relPath)
    val staged =
      if (msgs.nonEmpty) msgs.toSeq
      else {
        // all partitions empty: stage one zero-row schema-bearing file
        // so the committed version stays readable (delete() convention);
        // the parquet writer creates parent directories through the FS
        val rel = s"$sub/part-empty.parquet"
        new ParquetGroupWriter(s"$dir/$rel", writeSchema, statsIdxs).close()
        Seq(SnapshotFileMsg(rel, Seq.fill(statsIdxs.length)(0L),
          Seq.fill(statsIdxs.length)(-1L), 0L,
          Seq.fill(partCols.length)(None),
          Seq.fill(statsIdxs.length)(0L)))
      }
    val stats = statsCols.zipWithIndex.map { case (c, i) =>
      // an empty or ALL-NULL file's (MaxValue, MinValue) sentinel
      // prunes always — harmless and correct (may-contain semantics);
      // normalize the driver fallback's (0, -1) to the same shape
      (c, staged.map(m =>
        if (m.rows == 0L || m.mns(i) == Long.MaxValue)
          (Long.MaxValue, Long.MinValue)
        else (m.mns(i), m.mxs(i))))
    }
    val nulls = statsCols.zipWithIndex.map { case (c, i) =>
      (c, staged.map(m => if (m.nulls.isEmpty) 0L else m.nulls(i)))
    }
    val parts =
      if (partCols.isEmpty) None
      else Some((partCols, staged.map(_.pvals)))
    SnapshotTable.commitStagedFiles(dir, staged.map(_.relPath),
      writeSchema, overwrite, stats, parts = parts, nulls = nulls)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: SnapshotCommitMsg => m }
      .flatMap(_.files)
      .foreach(f => SnapshotSource.deleteQuiet(s"$dir/${f.relPath}"))
}

class SnapshotWriterFactory(dir: String, sub: String, schema: StructType,
                            statsIdxs: Array[Int],
                            partIdxs: Array[Int] = Array.empty,
                            maxOpenWriters: Int =
                              SnapshotWrite.defaultMaxOpenWriters)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new SnapshotDataWriter(dir, sub, schema, statsIdxs, partIdxs,
      partitionId, taskId, maxOpenWriters)
}

/** One parquet file per NON-EMPTY task — or, on a PARTITIONED write,
  * one VALUE-PURE file per partition tuple the task sees (rows route
  * by tuple, so the manifest can record exact per-file values; the
  * streaming-ingest-into-a-day-partitioned-table pattern): writers
  * open lazily on the first row of each tuple and rows stream straight
  * through, stats folding as they pass — nothing buffers beyond
  * parquet's row groups. Empty tasks commit an empty message (no
  * zero-row file litter). All file I/O goes through the Hadoop FS
  * resolved from the table path (create makes parents; executors on a
  * real cluster stage straight to the table's object store, never a
  * local disk). */
class SnapshotDataWriter(dir: String, sub: String, schema: StructType,
                         statsIdxs: Array[Int], partIdxs: Array[Int],
                         partitionId: Int, taskId: Long,
                         maxOpenWriters: Int =
                           SnapshotWrite.defaultMaxOpenWriters)
    extends DataWriter[InternalRow] {
  // tuple -> (relPath, writer); insertion-ordered so commit messages
  // are deterministic given the task's row order
  private val writers = scala.collection.mutable.LinkedHashMap
    .empty[Seq[Option[String]], (String, ParquetGroupWriter)]

  /** The canonical string of a partition value — must agree with
    * `cast(col as string)` ([[graft.io.SnapshotTable.partValueString]]
    * on the prune side); the type set is the one commitPartitioned
    * admits. */
  private def partVal(row: InternalRow, i: Int): Option[String] =
    if (row.isNullAt(i)) None
    else Some(schema(i).dataType match {
      case StringType => row.getUTF8String(i).toString
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case ShortType => row.getShort(i).toString
      case ByteType => row.getByte(i).toString
      case BooleanType => row.getBoolean(i).toString
      case DateType =>
        java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
      case other => throw new IllegalArgumentException(
        s"unsupported partition column type $other for ${schema(i).name}")
    })

  override def write(row: InternalRow): Unit = {
    val tuple: Seq[Option[String]] =
      if (partIdxs.isEmpty) Seq.empty
      else partIdxs.map(partVal(row, _)).toSeq
    val (_, w) = writers.getOrElseUpdate(tuple, {
      // each open writer buffers up to a parquet row group: a task
      // seeing unbounded distinct tuples is the classic partitionBy
      // OOM — fail LOUDLY naming the fix (co-locate tuples per task)
      // instead of dying on the executor heap
      require(writers.size < maxOpenWriters,
        s"task saw > $maxOpenWriters distinct partition tuples — " +
          "repartition by the partition columns before writing (each " +
          "value then lands in one task), or raise " +
          "spark.graft.maxOpenPartitionWriters")
      val rel =
        f"$sub/part-$partitionId%05d-$taskId-f${writers.size}.parquet"
      (rel, new ParquetGroupWriter(s"$dir/$rel", schema, statsIdxs))
    })
    w.write(row)
  }
  override def commit(): WriterCommitMessage =
    SnapshotCommitMsg(writers.toSeq.map { case (tuple, (rel, w)) =>
      w.close()
      SnapshotFileMsg(rel, w.mns.toSeq, w.mxs.toSeq, w.rows, tuple,
        w.nulls.toSeq)
    })
  override def abort(): Unit = writers.values.foreach { case (rel, w) =>
    w.close()
    SnapshotSource.deleteQuiet(s"$dir/$rel")
  }
  override def close(): Unit = ()
}
