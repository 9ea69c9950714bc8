package graft.llm

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import WarcCodec.WarcRecord

/** The WARC 1.1 container codec (q137): record grammar, per-record gzip
  * members, HTTP payload splitting, third-party-writer bytes, truncation
  * failure, and the distributed write→read seam. */
class WarcCodecSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, body: String): WarcRecord = WarcRecord(
    warcType = "response",
    recordId = f"<urn:uuid:00000000-0000-0000-0000-$id%012x>",
    date = "2026-01-01T00:00:00Z",
    targetUri = s"http://corpus.local/doc/$id",
    contentType = "application/http;msgtype=response",
    payload = WarcCodec.httpResponse(body.getBytes(UTF_8), "text/html"))

  test("record roundtrip preserves every field and the exact payload") {
    val r = rec(7L, "<p>hello &amp; goodbye</p>")
    val parsed = WarcCodec.parseAll(WarcCodec.writeRecord(r)).toSeq
    assert(parsed.size == 1)
    val p = parsed.head
    assert(p.warcType == r.warcType && p.recordId == r.recordId &&
      p.date == r.date && p.targetUri == r.targetUri &&
      p.contentType == r.contentType)
    assert(p.payload.sameElements(r.payload))
  }

  test("multi-record file with per-record gzip members parses in order") {
    val rs = (0L until 5L).map(i => rec(i, s"body number $i"))
    val file = WarcCodec.writeFile(rs.iterator, gzip = true)
    // gzip magic up front — the sniffed path
    assert((file(0) & 0xff) == 0x1f && (file(1) & 0xff) == 0x8b)
    val back = WarcCodec.parseAll(file).toSeq
    assert(back.map(_.targetUri) == rs.map(_.targetUri))
    assert(back.zip(rs).forall { case (a, b) => a.payload.sameElements(b.payload) })
  }

  test("uncompressed concatenation parses too (annex-D optionality)") {
    val rs = (0L until 3L).map(i => rec(i, s"plain $i"))
    val back = WarcCodec.parseAll(WarcCodec.writeFile(rs.iterator, gzip = false))
    assert(back.size == 3)
  }

  test("reads a conforming third-party record byte-for-byte") {
    // hand-authored per the spec grammar — not produced by our writer
    // (extra non-mandatory header, different field order)
    val body = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Content-Length: 5\r\n\r\nhello"
    val head = "WARC/1.0\r\n" + // older minor version, same grammar
      "WARC-Record-ID: <urn:uuid:abc>\r\n" +
      "Content-Length: " + body.length + "\r\n" +
      "WARC-Date: 2020-05-05T00:00:00Z\r\n" +
      "WARC-Payload-Digest: sha1:DEADBEEF\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://example.org/x\r\n\r\n"
    val bytes = (head + body + "\r\n\r\n").getBytes(UTF_8)
    val r = WarcCodec.parseAll(bytes).toSeq.head
    assert(r.warcType == "response" && r.targetUri == "http://example.org/x")
    val (status, entity) = WarcCodec.parseHttp(r.payload)
    assert(status == 200 && new String(entity, UTF_8) == "hello")
  }

  test("truncated record fails loudly, not silently") {
    val full = WarcCodec.writeRecord(rec(1L, "some body text"))
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 10)
    intercept[IllegalArgumentException] {
      WarcCodec.parseAll(cut).toSeq
    }
  }

  test("non-WARC bytes are rejected") {
    intercept[IllegalArgumentException] {
      WarcCodec.parseAll("HTTP/1.1 200 OK\r\n\r\nnope\r\n\r\n".getBytes(UTF_8)).toSeq
    }
  }

  test("distributed write -> binaryFile read roundtrips the corpus") {
    val docs = (0L until 40L).map(i => (i, s"<p>doc $i body</p>"))
      .toDF("doc_id", "html").repartition(4)
    val dir = Files.createTempDirectory("graft-warc-spec").toString
    val manifest = WebArchive.writeWarc(spark, docs, dir)
    assert(manifest.map(_.n_records).sum == 40L)
    assert(manifest.forall(_.file.endsWith(".warc.gz")))
    val back = WebArchive.readWarc(spark, dir).collect()
    assert(back.length == 40)
    assert(back.map(_.doc_id).sorted.toSeq == (0L until 40L))
    val d7 = back.find(_.doc_id == 7L).get
    assert(d7.uri == "http://corpus.local/doc/7" && d7.http_status == 200L)
    assert(d7.html == "<p>doc 7 body</p>")
    // content_length = the full HTTP message the record framed
    val http = WarcCodec.httpResponse(d7.html.getBytes(UTF_8),
      "text/html; charset=utf-8")
    assert(d7.content_length == http.length.toLong)
  }

  test("caller-supplied target URIs survive the roundtrip (q143 staging)") {
    val docs = Seq((1L, "<p>a</p>", "http://a.crawl.example/doc/1"),
                   (2L, "<p>b</p>", "http://b.crawl.example/doc/2"))
      .toDF("doc_id", "html", "uri")
    val dir = Files.createTempDirectory("graft-warc-uri").toString
    WebArchive.writeWarc(spark, docs, dir)
    val back = WebArchive.readWarc(spark, dir).collect()
      .map(d => d.doc_id -> d.uri).toMap
    assert(back == Map(1L -> "http://a.crawl.example/doc/1",
                       2L -> "http://b.crawl.example/doc/2"))
  }

  test("non-response records are skipped by the reader") {
    val info = WarcCodec.WarcRecord("warcinfo", "<urn:uuid:i>", "2026-01-01T00:00:00Z",
      "", "application/warc-fields", "software: graft\r\n".getBytes(UTF_8))
    val resp = rec(3L, "kept")
    val dir = Files.createTempDirectory("graft-warc-skip")
    Files.write(dir.resolve("part-00000.warc.gz"),
      WarcCodec.writeFile(Iterator(info, resp), gzip = true))
    val back = WebArchive.readWarc(spark, dir.toString).collect()
    assert(back.length == 1 && back.head.doc_id == 3L)
  }
}
