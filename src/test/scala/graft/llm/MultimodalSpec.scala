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
}
