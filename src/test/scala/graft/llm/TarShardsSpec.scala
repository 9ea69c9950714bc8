package graft.llm

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec

/** ustar codec laws + the Spark shard seam roundtrip. */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  test("codec: header/parse roundtrip with padding and checksum") {
    val entries = Seq(
      "1.txt" -> "hello world".getBytes(UTF_8),
      "1.json" -> """{"a":1}""".getBytes(UTF_8),
      "2.txt" -> Array.fill[Byte](513)(7), // crosses a block boundary
      "3.txt" -> Array.emptyByteArray)     // zero-length entry
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (n, d) =>
      out.write(TarCodec.header(n, d.length.toLong))
      out.write(d)
      val pad = (512 - d.length % 512) % 512
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    val back = TarCodec.parseAll(out.toByteArray).toSeq
    assert(back.map(_._1) == entries.map(_._1))
    assert(back.zip(entries).forall { case ((_, a), (_, b)) =>
      java.util.Arrays.equals(a, b) })
  }

  test("codec: corrupted header fails loudly, not silently") {
    val bytes = TarCodec.header("x.txt", 0) ++ new Array[Byte](1024)
    bytes(0) = 'y' // name byte flips → checksum no longer matches
    intercept[IllegalArgumentException] {
      TarCodec.parseAll(bytes).toSeq
    }
  }

  test("shard seam: write → read roundtrip, including hostile strings") {
    val docs = Seq(
      (1L, "plain text", "en", "src1"),
      (2L, "quotes \" and \\ backslash\nnewline\ttab", "d\"e", "s\\rc"),
      (3L, "unicode: caféλ🚀", "ja", "src2"),
      (4L, "", "en", "src1")) // empty payload
      .toDF("doc_id", "text", "lang", "source")
    val dir = Files.createTempDirectory("tar-spec").toString
    val manifest = TarShards.writeShards(spark, docs.repartition(2), dir)
    assert(manifest.map(_.n_samples).sum == 4)
    val back = TarShards.readShards(spark, dir)
      .collect().map(d => (d.doc_id, d.text, d.lang, d.source)).toSet
    assert(back == Set(
      (1L, "plain text", "en", "src1"),
      (2L, "quotes \" and \\ backslash\nnewline\ttab", "d\"e", "s\\rc"),
      (3L, "unicode: caféλ🚀", "ja", "src2"),
      (4L, "", "en", "src1")))
  }

  test("shard seam: unpaired sample is corruption, fails loudly") {
    val dir = Files.createTempDirectory("tar-bad").toString
    val f = new java.io.FileOutputStream(s"$dir/shard-00000.tar")
    val d = "orphan".getBytes(UTF_8)
    f.write(TarCodec.header("9.txt", d.length.toLong)) // .txt with no .json
    f.write(d); f.write(new Array[Byte](512 - d.length))
    f.write(new Array[Byte](1024))
    f.close()
    val ex = intercept[org.apache.spark.SparkException] {
      TarShards.readShards(spark, dir).collect()
    }
    assert(ex.getMessage != null)
  }
}
