package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The real-codec image (q98), audio (q102) and video-container (q103)
  * paths and their failure contracts. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("PNG roundtrip recovers exact dimensions and pixel sums") {
    val ids = Seq(0L, 1L, 17L, 123L).toDF("doc_id")
    val out = Multimodal.decodeImages(spark,
        Multimodal.encodePng(spark, ids).toDF())
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.keySet == Set(0L, 1L, 17L, 123L))
    out.foreach { case (id, m) =>
      val w = 8 + id % 25
      val h = 8 + (id * 7) % 25
      assert(m.width == w && m.height == h && m.n_pixels == w * h)
      val expected = (for (x <- 0L until w; y <- 0L until h)
        yield (x + y + id) % 256).sum
      assert(m.sum_gray == expected, s"doc $id")
    }
  }

  test("real resize: 2x2 box filter matches the analytic block averages") {
    val ids = Seq(0L, 1L, 17L, 123L).toDF("doc_id")
    val out = Multimodal.decodeImages(spark,
        Multimodal.resizeImages(spark,
          Multimodal.encodePng(spark, ids).toDF(), factor = 2).toDF())
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.keySet == Set(0L, 1L, 17L, 123L))
    out.foreach { case (id, m) =>
      val rw = (8 + id % 25) / 2
      val rh = (8 + (id * 7) % 25) / 2
      assert(m.width == rw && m.height == rh && m.n_pixels == rw * rh,
        s"doc $id")
      val expected = (for (xo <- 0L until rw; yo <- 0L until rh) yield {
        val s = 2 * xo + 2 * yo + id
        (s % 256 + 2 * ((s + 1) % 256) + (s + 2) % 256) / 4
      }).sum
      assert(m.sum_gray == expected, s"doc $id")
    }
  }

  test("real resize: sub-block images and junk payloads are dropped") {
    // a 1x1 PNG is smaller than one 2x2 block
    val tiny = {
      val img = new java.awt.image.BufferedImage(
        1, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val good = Multimodal.encodePng(spark, Seq(5L).toDF("doc_id")).toDF()
    val bad = Seq(98L -> tiny, 99L -> Array[Byte](1, 2, 3, 4))
      .toDF("doc_id", "media")
    val out = Multimodal.resizeImages(spark, good.unionByName(bad), 2)
      .collect()
    assert(out.map(_.doc_id).toSeq == Seq(5L))
  }

  test("image histogram buckets real decoded pixels, zero buckets kept") {
    val out = Multimodal.imageHistogram(spark,
        Multimodal.encodePng(spark, Seq(3L).toDF("doc_id")).toDF())
      .collect()
    assert(out.length == 1 && out.head.histogram.length == 16)
    val id = 3L
    val w = 8 + id % 25; val h = 8 + (id * 7) % 25
    val expected = new Array[Long](16)
    for (x <- 0L until w; y <- 0L until h)
      expected(((x + y + id) % 256).toInt / 16) += 1
    assert(out.head.histogram.toSeq == expected.toSeq)
    assert(out.head.histogram.sum == w * h)
  }

  test("undecodable payloads are dropped, not failed") {
    val good = Multimodal.encodePng(spark, Seq(5L).toDF("doc_id")).toDF()
    val bad = Seq((99L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "media")
    val out = Multimodal.decodeImages(spark, good.unionByName(bad))
      .collect().map(_.doc_id).toSet
    assert(out == Set(5L)) // garbage row silently dropped
  }

  test("WAV roundtrip recovers exact format, sample counts and sums") {
    val ids = Seq(0L, 1L, 17L, 123L).toDF("doc_id")
    val out = Multimodal.decodeWav(spark,
        Multimodal.encodeWav(spark, ids).toDF())
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.keySet == Set(0L, 1L, 17L, 123L))
    out.foreach { case (id, m) =>
      val ns = 32 + id % 97
      assert(m.sample_rate == 8000L && m.channels == 1L, s"doc $id")
      assert(m.n_samples == ns, s"doc $id")
      val expected = (0L until ns).map(i => (id * 31 + i * 17) % 4001 - 2000).sum
      assert(m.sum_val == expected, s"doc $id")
    }
  }

  test("undecodable audio payloads are dropped, not failed") {
    val good = Multimodal.encodeWav(spark, Seq(5L).toDF("doc_id")).toDF()
    // a truncated RIFF header: sniffable as "maybe WAV", not decodable
    val bad = Seq((99L, Array[Byte](82, 73, 70, 70))).toDF("doc_id", "media")
    val out = Multimodal.decodeWav(spark, good.unionByName(bad))
      .collect().map(_.doc_id).toSet
    assert(out == Set(5L))
  }

  test("AVI roundtrip recovers exact dimensions, frame counts and pixel sums") {
    val ids = Seq(0L, 1L, 17L, 123L).toDF("doc_id")
    val out = Multimodal.decodeAvi(spark,
        Multimodal.encodeAvi(spark, ids).toDF())
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.keySet == Set(0L, 1L, 17L, 123L))
    out.foreach { case (id, m) =>
      val w = 8 + 4 * (id % 12)
      val h = 8 + (id * 3) % 17
      val nf = 2 + id % 7
      assert(m.width == w && m.height == h && m.n_frames == nf, s"doc $id")
      val expected = (for (f <- 0L until nf; y <- 0L until h; x <- 0L until w)
        yield (x + 2 * y + 3 * f + id) % 256).sum
      assert(m.sum_px == expected, s"doc $id")
    }
  }

  test("AVI parser: truncated, non-AVI and non-8-bit payloads are dropped") {
    val good = Multimodal.encodeAvi(spark, Seq(5L).toDF("doc_id")).toDF()
    val goodBytes = good.select("media").as[Array[Byte]].head()
    val bad = Seq(
      99L -> Array[Byte](82, 73, 70, 70),      // bare "RIFF"
      98L -> goodBytes.take(40),               // truncated mid-header
      97L -> Array.fill[Byte](64)(0)           // zeros: no magic
    ).toDF("doc_id", "media")
    val out = Multimodal.decodeAvi(spark, good.unionByName(bad))
      .collect().map(_.doc_id).toSet
    assert(out == Set(5L))
  }

  test("AVI frame sampling keeps every k-th frame in stream order") {
    val ids = Seq(0L, 6L, 123L).toDF("doc_id") // nf = 2, 8, 6
    val out = Multimodal.sampleFramesAvi(spark,
        Multimodal.encodeAvi(spark, ids).toDF(), every = 3)
      .collect().map(m => m.doc_id -> m).toMap
    out.foreach { case (id, m) =>
      val w = 8 + 4 * (id % 12)
      val h = 8 + (id * 3) % 17
      val nf = 2 + id % 7
      assert(m.n_frames == nf, s"doc $id")
      assert(m.sampled_frames == (nf + 2) / 3, s"doc $id")
      val expected = (for (f <- 0L until nf if f % 3 == 0;
                           y <- 0L until h; x <- 0L until w)
        yield (x + 2 * y + 3 * f + id) % 256).sum
      assert(m.sampled_px == expected, s"doc $id")
    }
  }

  test("AVI parser is a generic chunk walk, not an offset replay") {
    // insert a foreign chunk ("JUNK", the canonical RIFF padding chunk)
    // between hdrl and movi: a conforming parser skips it by size and
    // still finds every frame; an offset-replay parser breaks
    val bytes = AviCodec.write(8, 4, 2, fps = 10, (x, y, f) => x + y + f)
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // locate the movi LIST by walking top-level chunks
    var pos = 12
    var moviPos = -1
    while (moviPos < 0) {
      val size = buf.getInt(pos + 4)
      if (buf.getInt(pos) == 0x5453494c /* LIST */ &&
          buf.getInt(pos + 8) == 0x69766f6d /* movi */) moviPos = pos
      else pos += 8 + size + (size & 1)
    }
    val junk = new Array[Byte](8 + 6) // odd body size: exercises padding
    val jb = java.nio.ByteBuffer.wrap(junk)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    jb.putInt(0x4b4e554a /* JUNK */); jb.putInt(5)
    val patched = bytes.take(moviPos) ++ junk ++ bytes.drop(moviPos)
    // RIFF form size grew
    val pb = java.nio.ByteBuffer.wrap(patched)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    pb.putInt(4, patched.length - 8)
    val parsed = AviCodec.parse(patched)
    assert(parsed.isDefined)
    assert(parsed.get.width == 8 && parsed.get.height == 4 &&
      parsed.get.nFrames == 2)
    assert(parsed.get.sumPx == AviCodec.parse(bytes).get.sumPx)
  }
}
