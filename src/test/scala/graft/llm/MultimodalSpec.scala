package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The real-codec image path (q98) and its failure contract. */
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
}
