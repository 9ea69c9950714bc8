package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 WRITE path: an auditing sink that counts rows and folds a
  * deterministic checksum per task, aggregating task commit messages on
  * the driver — the full DSv2 write protocol (WriteBuilder → BatchWrite /
  * StreamingWrite → per-partition DataWriter → driver-side commit) without
  * needing an external store in this zero-egress container.
  *
  * `df.write.format("graft.sources.AuditSink").option("name", t).save()`
  * then [[AuditSink.result]](t) returns (rows, checksum). Streaming:
  * `writeStream.format(...)` — each epoch's totals accumulate.
  *
  * The commit protocol is exercised for real: writers that fail before
  * commit contribute nothing (task retries can't double-count — only
  * committed messages reach the driver aggregation).
  */
class AuditSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AuditTable(properties.asScala.getOrElse("name", "default"), schema)
}

object AuditSink {
  private val results = new ConcurrentHashMap[String, (Long, Long)]()
  private val lastEpoch = new ConcurrentHashMap[String, Long]()

  def result(name: String): Option[(Long, Long)] = Option(results.get(name))

  def clear(name: String): Unit = { results.remove(name); lastEpoch.remove(name) }

  private[sources] def accumulate(name: String, rows: Long, checksum: Long): Unit =
    results.merge(name, (rows, checksum),
      (a, b) => (a._1 + b._1, (a._2 + b._2) % 1000000007L))

  /** Epoch-idempotent streaming accumulate: after a failure between sink
    * commit and offset-log commit, Structured Streaming REPLAYS the epoch
    * — the sink sees the same epochId twice and must not double-count
    * (exactly-once sinks key their commit on epochId; this is the
    * in-memory analog). Task-retry dedup is separate: uncommitted writer
    * messages never reach commit at all. */
  private[sources] def accumulateEpoch(name: String, epochId: Long,
                                       rows: Long, checksum: Long): Unit = {
    val prev = lastEpoch.get(name)
    if (lastEpoch.containsKey(name) && epochId <= prev) return
    lastEpoch.put(name, epochId)
    accumulate(name, rows, checksum)
  }
}

class AuditTable(name: String, schema: StructType) extends Table with SupportsWrite {
  override def name(): String = s"graft_audit($name)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
        TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new AuditWrite(name, info.schema())
    }
}

case class AuditCommit(rows: Long, checksum: Long) extends WriterCommitMessage

class AuditWrite(name: String, schema: StructType) extends Write {
  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new AuditWriterFactory(schema)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach { case AuditCommit(r, c) =>
        AuditSink.accumulate(name, r, c)
      }
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      new AuditStreamingWriterFactory(schema)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val (rows, ck) = messages.foldLeft((0L, 0L)) {
        case ((r, c), AuditCommit(mr, mc)) => (r + mr, (c + mc) % 1000000007L)
      }
      AuditSink.accumulateEpoch(name, epochId, rows, ck)
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

class AuditWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditWriter(schema)
}

class AuditStreamingWriterFactory(schema: StructType) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new AuditWriter(schema)
}

/** Per-task writer: counts rows, folds a type-agnostic checksum from the
  * row's string projection (cheap, deterministic for deterministic
  * inputs). */
class AuditWriter(schema: StructType) extends DataWriter[InternalRow] {
  private var rows = 0L
  private var checksum = 0L

  override def write(record: InternalRow): Unit = {
    rows += 1
    var i = 0
    while (i < schema.length) {
      if (!record.isNullAt(i)) {
        val h = record.get(i, schema(i).dataType).hashCode().toLong
        checksum = (checksum + (h & 0x7fffffffL)) % 1000000007L
      }
      i += 1
    }
  }

  override def commit(): WriterCommitMessage = AuditCommit(rows, checksum)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
