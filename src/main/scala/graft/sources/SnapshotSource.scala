package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
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
  * Each input partition is ONE manifest data file, read executor-side
  * with the public parquet-hadoop record API (footer → row groups →
  * `GroupRecordConverter`) under the requested-column projection, so
  * column pruning reaches the page level. Supported column types are
  * the flat primitives the snapshot tier commits (long/int/double/
  * float/boolean/string/binary/date/timestamp); production extensions
  * (row-group splitting for >128 MB files, a `SerializableConfiguration`
  * for non-local filesystems, vectorized reads) slot into the reader
  * factory without touching the planner. */
class SnapshotSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = SnapshotSource.dir(options.asScala.toMap)
    val v = SnapshotTable.resolveVersion(dir,
      Option(options.get("versionAsOf")).map(_.toInt))
    SnapshotTable.readSchema(dir, v).getOrElse(
      // legacy pre-schema manifest: infer from the first file's footer
      SnapshotSource.footerSchema(
        s"$dir/${SnapshotTable.manifestFiles(dir, v).head}"))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SnapshotDsTable(schema, properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object SnapshotSource {
  private[sources] def dir(props: Map[String, String]): String =
    props.getOrElse("path",
      throw new IllegalArgumentException(
        "SnapshotSource needs a table path: .load(dir)"))

  /** Flat-primitive MessageType → StructType for legacy manifests; the
    * same type set the reader supports. */
  private[sources] def footerSchema(file: String): StructType = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try {
      val msg = reader.getFooter.getFileMetaData.getSchema
      StructType(msg.getFields.asScala.map { f =>
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
        import org.apache.parquet.schema.LogicalTypeAnnotation
        require(f.isPrimitive, s"unsupported nested column ${f.getName}")
        val p = f.asPrimitiveType()
        val logical = p.getLogicalTypeAnnotation
        val dt = p.getPrimitiveTypeName match {
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
        StructField(f.getName, dt, nullable = true)
      }.toSeq)
    } finally reader.close()
  }
}

class SnapshotDsTable(tableSchema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  private val dir = SnapshotSource.dir(props)
  private val snapVersion = SnapshotTable.resolveVersion(dir,
    props.get("versionAsOf").map(_.toInt))
  override def name(): String = s"graft_snapshot($dir@v$snapVersion)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(dir, snapVersion, tableSchema)
}

class SnapshotScanBuilder(dir: String, version: Int, tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val statsCol = SnapshotTable.statsColumn(dir, version)
  private var bounds: Option[(Long, Long)] = None
  private var pushed = Array.empty[Filter]
  private var required: StructType = tableSchema

  private def longOf(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l)
    case i: java.lang.Integer => Some(i.toLong)
    case _ => None
  }

  private def narrow(lo: Long, hi: Long): Unit = bounds = Some(bounds match {
    case Some((a, b)) => (math.max(a, lo), math.min(b, hi))
    case None => (lo, hi)
  })

  /** Stats-column range/equality filters narrow the FILE LIST; every
    * filter (including those) is returned as residual because file
    * stats are may-contain, not row-exact — the parquet row-group
    * contract. `pushedFilters` reports the pruning set for explain. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val sc = statsCol.getOrElse("")
    pushed = filters.filter {
      case EqualTo(`sc`, v) => longOf(v).exists { l => narrow(l, l); true }
      case GreaterThan(`sc`, v) =>
        longOf(v).exists { l => narrow(l + 1, Long.MaxValue); true }
      case GreaterThanOrEqual(`sc`, v) =>
        longOf(v).exists { l => narrow(l, Long.MaxValue); true }
      case LessThan(`sc`, v) =>
        longOf(v).exists { l => narrow(Long.MinValue, l - 1); true }
      case LessThanOrEqual(`sc`, v) =>
        longOf(v).exists { l => narrow(Long.MinValue, l); true }
      case _ => false
    }
    filters // all residual: Spark re-applies row-level
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val files = SnapshotTable.manifestFiles(dir, version, bounds)
      .map(f => s"$dir/$f")
    SnapshotScan(files, required, version,
      statsCol.filter(_ => bounds.nonEmpty))
  }
}

case class SnapshotScan(files: Seq[String], required: StructType,
                        version: Int, prunedOn: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_snapshot v$version files=${files.size}" +
      prunedOn.fold("")(c => s" statsPruned=$c") +
      s" cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(SnapshotFilePartition).toArray[InputPartition]
  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotReaderFactory(required)
}

case class SnapshotFilePartition(path: String) extends InputPartition

class SnapshotReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new ParquetGroupReader(
      partition.asInstanceOf[SnapshotFilePartition].path, required)
}

/** Executor-side parquet record reader over the PUBLIC parquet-hadoop
  * API: footer → projected row groups → assembled [[Group]] records →
  * InternalRow. Columns requested but absent from THIS file (schema
  * evolution: the file predates the column) null-fill, which is the
  * manifest schema's read-time contract. An empty projection (count(*)
  * plans zero columns) short-circuits to emitting `recordCount` empty
  * rows without touching any page. */
class ParquetGroupReader(path: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new Path(path), new Configuration()))
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
        else f.dataType match {
          case LongType | TimestampType => g.getLong(f.name, 0)
          case IntegerType | DateType => g.getInteger(f.name, 0)
          case DoubleType => g.getDouble(f.name, 0)
          case FloatType => g.getFloat(f.name, 0)
          case BooleanType => g.getBoolean(f.name, 0)
          case StringType => UTF8String.fromString(g.getString(f.name, 0))
          case BinaryType => g.getBinary(f.name, 0).getBytes
          case other => throw new IllegalArgumentException(
            s"unsupported snapshot column type $other for ${f.name}")
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
