package graft.llm

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WARC ingest/egest — the Spark seam over [[WarcCodec]].
  *
  * This is the Common-Crawl shape: a crawl is ~10^5 multi-record
  * `.warc.gz` files; ingest parallelism is file-granular (one task
  * parses one file's member sequence), so the unit of work Spark
  * schedules is exactly the unit the archive format defines. The
  * `binaryFile` source carries (path, content) rows; parsing, HTTP
  * splitting and text extraction all happen inside one `mapPartitions`
  * pass — no raw-payload shuffle anywhere, only extracted metadata and
  * clean text leave the scan stage ([[Multimodal]]'s media rule).
  *
  * At 100 TB: a real crawl file is ~1 GiB and `binaryFile` materializes
  * one file per row, so executor memory budgets to max-file-size per
  * core — the same contract Common Crawl's own Spark examples use. The
  * writer emits one file per input partition with deterministic names,
  * so task retries overwrite rather than duplicate.
  */
object WebArchive {

  /** Deterministic record identity for a corpus doc: the spec's
    * `urn:uuid` form with the doc id in the node field. */
  private def recordId(docId: Long): String =
    f"<urn:uuid:00000000-0000-0000-0000-$docId%012x>"

  case class WarcFile(file: String, n_records: Long)

  /** Stage `(doc_id, html[, uri])` rows as real per-record-gzipped WARC
    * `response` files under `outDir`, one file per partition. A `uri`
    * column sets each record's WARC-Target-URI (it must keep the
    * `/doc/<id>` path tail the reader recovers ids from); absent, the
    * default corpus-local URI is derived from the id. Forces the write
    * (an action) and returns the per-file manifest — bounded at one row
    * per partition, the K2-style metadata collect. */
  def writeWarc(spark: SparkSession, docs: DataFrame, outDir: String)
      : Seq[WarcFile] = {
    import spark.implicits._
    new File(outDir).mkdirs()
    val withUri =
      if (docs.columns.contains("uri")) docs.select(
        col("doc_id").cast("long"), col("html"), col("uri"))
      else docs.select(col("doc_id").cast("long"), col("html"),
        concat(lit("http://corpus.local/doc/"), col("doc_id")).as("uri"))
    withUri
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val f = new File(outDir, f"part-$pid%05d.warc.gz")
        var n = 0L
        val out = new FileOutputStream(f) // overwrite → retry-idempotent
        try it.foreach { case (id, html, uri) =>
          val http = WarcCodec.httpResponse(
            html.getBytes(UTF_8), "text/html; charset=utf-8")
          val rec = WarcCodec.WarcRecord(
            warcType = "response",
            recordId = recordId(id),
            date = "2026-01-01T00:00:00Z",
            targetUri = uri,
            contentType = "application/http;msgtype=response",
            payload = http)
          out.write(WarcCodec.gzipMember(WarcCodec.writeRecord(rec)))
          n += 1
        } finally out.close()
        if (n == 0) Iterator.empty else Iterator(WarcFile(f.toString, n))
      }
      .collect().toSeq
  }

  case class CrawledDoc(doc_id: Long, uri: String, http_status: Long,
                        content_length: Long, html: String)

  /** Distributed parse of a directory of WARC files: `binaryFile` scan →
    * per-file record walk → HTTP split. Non-`response` records are
    * skipped (a conforming crawl interleaves `warcinfo`/`request`/
    * `metadata` records); the doc id is recovered from the target URI
    * path tail. */
  def readWarc(spark: SparkSession, dir: String): Dataset[CrawledDoc] = {
    import spark.implicits._
    // pathGlobFilter (not a glob in the path) so the FileStreamSink
    // metadata probe stats the real directory — a literal-glob path makes
    // it log a spurious FileNotFoundException WARN on every resolution.
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions { files =>
        files.flatMap { bytes =>
          WarcCodec.parseAll(bytes).collect {
            case r if r.warcType == "response" =>
              val (status, body) = WarcCodec.parseHttp(r.payload)
              CrawledDoc(
                doc_id = r.targetUri.substring(
                  r.targetUri.lastIndexOf('/') + 1).toLong,
                uri = r.targetUri,
                http_status = status.toLong,
                content_length = r.payload.length.toLong,
                html = new String(body, UTF_8))
          }
        }
      }
  }
}
