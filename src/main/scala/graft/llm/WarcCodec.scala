package graft.llm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Minimal spec-compliant WARC 1.1 web-archive codec (ISO 28500; the
  * published format of Common Crawl and every national web archive — the
  * raw-input tier in front of an LLM web-data pipeline).
  *
  * Layout (WARC 1.1 §4): a WARC file is a sequence of records, each
  *
  * {{{
  * WARC/1.1 CRLF
  * <named-field>: <value> CRLF ...        (must include Content-Length)
  * CRLF
  * <Content-Length content bytes>
  * CRLF CRLF
  * }}}
  *
  * Compressed files (annex D) are a concatenation of per-record gzip
  * MEMBERS — each record its own member, so a reader can seek to a
  * member boundary and decode one record without the rest of the file
  * (the property Common Crawl's index relies on). `parseAll` sniffs the
  * gzip magic and handles both layouts; JDK `GZIPInputStream` decodes
  * concatenated members natively.
  *
  * Like [[AviCodec]] this is deliberately container-level and writer-
  * agnostic: the parser walks the published grammar (version line,
  * header block to the blank line, `Content-Length` payload, two-CRLF
  * record separator), so it reads any conforming writer's output, not
  * just its own. The HTTP `response` payload layer (RFC 9112 status
  * line + headers + body) gets the same treatment.
  */
private[llm] object WarcCodec {

  private val Crlf = "\r\n"

  /** One WARC record: the named fields this pipeline consumes plus the
    * raw content block. `contentLength` is always `payload.length`. */
  case class WarcRecord(
      warcType: String,
      recordId: String,
      date: String,
      targetUri: String,
      contentType: String,
      payload: Array[Byte])

  /** Serialize one record, uncompressed (WARC 1.1 §4 grammar). */
  def writeRecord(r: WarcRecord): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.1").append(Crlf)
      .append("WARC-Type: ").append(r.warcType).append(Crlf)
      .append("WARC-Record-ID: ").append(r.recordId).append(Crlf)
      .append("WARC-Date: ").append(r.date).append(Crlf)
      .append("WARC-Target-URI: ").append(r.targetUri).append(Crlf)
      .append("Content-Type: ").append(r.contentType).append(Crlf)
      .append("Content-Length: ").append(r.payload.length).append(Crlf)
      .append(Crlf)
      .toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + r.payload.length + 4)
    out.write(head)
    out.write(r.payload)
    out.write(Crlf.getBytes(UTF_8))
    out.write(Crlf.getBytes(UTF_8))
    out.toByteArray
  }

  /** One gzip member per record (annex D per-record compression). */
  def gzipMember(recordBytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(recordBytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(recordBytes)
    gz.finish()
    gz.close()
    bos.toByteArray
  }

  /** Serialize a whole file: per-record gzip members concatenated when
    * `gzip`, else records back to back. */
  def writeFile(records: Iterator[WarcRecord], gzip: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val bytes = writeRecord(r)
      out.write(if (gzip) gzipMember(bytes) else bytes)
    }
    out.toByteArray
  }

  /** Parse a whole WARC file (gzip-sniffed) into its records. Malformed
    * trailing garbage fails loudly — a truncated crawl file should
    * surface, not silently drop documents. */
  def parseAll(bytes: Array[Byte]): Iterator[WarcRecord] = {
    val plain =
      if (bytes.length >= 2 &&
          (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
        // multi-member stream: JDK GZIPInputStream concatenates members
        val gz = new GZIPInputStream(new ByteArrayInputStream(bytes))
        val out = new ByteArrayOutputStream(bytes.length * 4)
        val buf = new Array[Byte](64 * 1024)
        var n = gz.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = gz.read(buf) }
        gz.close()
        out.toByteArray
      } else bytes
    parseRecords(plain)
  }

  private def indexOfDoubleCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
          b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def parseRecords(b: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = 0
      def hasNext: Boolean = pos < b.length
      def next(): WarcRecord = {
        val headEnd = indexOfDoubleCrlf(b, pos)
        require(headEnd >= 0, s"WARC header block unterminated at $pos")
        val head = new String(b, pos, headEnd - pos, UTF_8)
        val lines = head.split(Crlf)
        require(lines.head.startsWith("WARC/"),
          s"not a WARC record at $pos: '${lines.head.take(20)}'")
        val fields = lines.tail.map { l =>
          val c = l.indexOf(':')
          require(c > 0, s"malformed WARC header line '$l'")
          l.substring(0, c).trim -> l.substring(c + 1).trim
        }.toMap
        val len = fields("Content-Length").toInt
        val payloadStart = headEnd + 4
        require(payloadStart + len + 4 <= b.length,
          s"truncated WARC record at $pos (need $len payload bytes)")
        val payload = java.util.Arrays.copyOfRange(
          b, payloadStart, payloadStart + len)
        require(
          b(payloadStart + len) == '\r' && b(payloadStart + len + 1) == '\n' &&
          b(payloadStart + len + 2) == '\r' && b(payloadStart + len + 3) == '\n',
          s"WARC record at $pos missing two-CRLF separator")
        pos = payloadStart + len + 4
        WarcRecord(
          fields.getOrElse("WARC-Type", ""),
          fields.getOrElse("WARC-Record-ID", ""),
          fields.getOrElse("WARC-Date", ""),
          fields.getOrElse("WARC-Target-URI", ""),
          fields.getOrElse("Content-Type", ""),
          payload)
      }
    }

  /** Wrap an entity body as the HTTP/1.1 response message a `response`
    * record stores (RFC 9112 §2.1: status line, headers, CRLF, body). */
  def httpResponse(body: Array[Byte], contentType: String): Array[Byte] = {
    val head = new StringBuilder()
      .append("HTTP/1.1 200 OK").append(Crlf)
      .append("Content-Type: ").append(contentType).append(Crlf)
      .append("Content-Length: ").append(body.length).append(Crlf)
      .append(Crlf)
      .toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + body.length)
    out.write(head)
    out.write(body)
    out.toByteArray
  }

  /** Split an HTTP response message into (status code, entity body). */
  def parseHttp(payload: Array[Byte]): (Int, Array[Byte]) = {
    val headEnd = indexOfDoubleCrlf(payload, 0)
    require(headEnd >= 0, "HTTP message missing header terminator")
    val head = new String(payload, 0, headEnd, UTF_8)
    val statusLine = head.split(Crlf).head
    require(statusLine.startsWith("HTTP/"), s"not HTTP: '$statusLine'")
    val status = statusLine.split(" ")(1).toInt
    (status,
      java.util.Arrays.copyOfRange(payload, headEnd + 4, payload.length))
  }
}
