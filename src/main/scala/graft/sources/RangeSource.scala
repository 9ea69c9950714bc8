package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 range source with REAL predicate pushdown and column
  * pruning — the "true pushed-down range scan" SURVEY.md §2.1/S5 names as
  * the DSv2 modeling of the reference's HBase keyed range read
  * (profile_daily.py:107-113).
  *
  * `spark.read.format("graft.sources.RangeSource")
  *   .option("start", a).option("end", b).option("slices", n).load()`
  *
  * Schema: (id BIGINT, bucket INT) with bucket = id % 10. Filters on `id`
  * (=, <, <=, >, >=) NARROW THE SCAN RANGE — rows outside the bound are
  * never generated, the DSv2 analog of HBase start/stop keys or parquet
  * row-group skipping. Unsupported filters stay with Spark as residuals.
  * Column pruning drops untouched columns from generation.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RangeTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object RangeSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false)))
}

class RangeTable(props: Map[String, String]) extends Table with SupportsRead {
  private val start = props.getOrElse("start", "0").toLong
  private val end = props.getOrElse("end", "1000").toLong
  private val slices = props.getOrElse("slices", "4").toInt
  private val rowsPerBatch = props.getOrElse("rowsPerBatch", "0").toLong
  override def name(): String = s"graft_range($start,$end)"
  override def schema(): StructType = RangeSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, slices, rowsPerBatch)
}

class RangeScanBuilder(start: Long, end: Long, slices: Int,
                       rowsPerBatch: Long = 0)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = start
  private var hi = end
  private var pushed = Array.empty[Filter]
  private var required: StructType = RangeSource.fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("id", _: java.lang.Long) => true
      case GreaterThan("id", _: java.lang.Long) => true
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case _ => false
    }
    supported.foreach {
      case EqualTo("id", v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan("id", v: java.lang.Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: java.lang.Long) => lo = math.max(lo, v)
      case LessThan("id", v: java.lang.Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: java.lang.Long) => hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = supported
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = RangeScan(lo, hi, slices, required, rowsPerBatch)
}

case class RangeScan(lo: Long, hi: Long, slices: Int, required: StructType,
                     rowsPerBatch: Long = 0)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RangeMicroBatchStream(lo, hi,
      if (rowsPerBatch > 0) rowsPerBatch else hi - lo, slices, required)
  override def description(): String =
    s"graft_range lo=$lo hi=$hi cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, math.min(slices, math.max(1L, hi - lo)).toInt)
    val step = math.max(1L, (hi - lo + n - 1) / n)
    (0 until n).iterator
      .map(i => RangePartition(lo + i * step, math.min(hi, lo + (i + 1) * step)))
      .filter(p => p.from < p.until)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required, columnar = true)
}

case class RangePartition(from: Long, until: Long) extends InputPartition

case class RangeOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Streaming face of the range source: the offset is simply the next
  * unread id; each trigger admits `rowsPerBatch` more rows until the end
  * of the (possibly filter-narrowed) range — a deterministic replay
  * source, the DSv2-streaming analog of the file-source replay used in
  * StreamingSpec. Predicate pushdown applies to the stream exactly as to
  * the batch (lo/hi arrive already narrowed). */
class RangeMicroBatchStream(lo: Long, hi: Long, rowsPerBatch: Long,
                            slices: Int, required: StructType)
    extends MicroBatchStream {
  private var available = lo

  override def initialOffset(): Offset = RangeOffset(lo)

  override def latestOffset(): Offset = {
    available = math.min(hi, available + rowsPerBatch)
    RangeOffset(available)
  }

  /** Called with offsets restored from the checkpoint log on restart: the
    * in-memory cursor must catch up to the committed position, or
    * latestOffset would regress below it and the stream would emit empty
    * (or negative-range) batches until the cursor walked back up. */
  override def deserializeOffset(json: String): Offset = {
    val v = json.toLong
    if (v > available) available = v
    RangeOffset(v)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[RangeOffset].v
    val until = end.asInstanceOf[RangeOffset].v
    RangeScan(from, until, slices, required).planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class RangeReaderFactory(required: StructType, columnar: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    // bind the projection once per partition, not per row
    val fieldGens: Array[Long => Any] = required.fields.map { f =>
      f.name match {
        case "id" => (id: Long) => id
        case "bucket" => (id: Long) => (id % 10).toInt
      }
    }
    new PartitionReader[InternalRow] {
      private var cur = p.from - 1
      override def next(): Boolean = { cur += 1; cur < p.until }
      override def get(): InternalRow =
        new GenericInternalRow(fieldGens.map(_(cur)).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }

  /** Vectorized path: the batch scan emits `ColumnarBatch`es of 4096
    * rows into reused on-heap vectors, so downstream whole-stage codegen
    * consumes columns without per-row object allocation — the same shape
    * as Spark's vectorized parquet reader (`Batched: true` in explain).
    * The streaming face keeps the row reader (micro-batches are small). */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.ColumnarBatch
    val p = partition.asInstanceOf[RangePartition]
    val capacity = 4096
    new PartitionReader[ColumnarBatch] {
      private val vectors = OnHeapColumnVector.allocateColumns(capacity, required)
      private val batch = new ColumnarBatch(
        vectors.map(_.asInstanceOf[org.apache.spark.sql.vectorized.ColumnVector]))
      private var cur = p.from

      override def next(): Boolean = {
        if (cur >= p.until) return false
        val n = math.min(capacity.toLong, p.until - cur).toInt
        var c = 0
        while (c < required.length) {
          val v = vectors(c)
          v.reset()
          required(c).name match {
            case "id" =>
              var i = 0
              while (i < n) { v.putLong(i, cur + i); i += 1 }
            case "bucket" =>
              var i = 0
              while (i < n) { v.putInt(i, ((cur + i) % 10).toInt); i += 1 }
          }
          c += 1
        }
        batch.setNumRows(n)
        cur += n
        true
      }

      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}
