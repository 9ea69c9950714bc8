package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Morton interleave correctness + the locality property the layout buys. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def ref(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("zValue2 matches the bit-interleave reference") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L),
      (1234567L, 7654321L), ((1L << 21) - 1, (1L << 21) - 1))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue2(col("a"), col("b")).as("z")).as[Long].collect()
    got.zip(cases).foreach { case (z, (a, b)) =>
      assert(z == ref(a, b, 21), s"for ($a, $b)")
    }
  }

  test("z-sorted layout clusters both dimensions into row groups") {
    // 32x32 grid z-sorted and cut into 16 chunks: every chunk must span a
    // bounded sub-rectangle of BOTH dimensions (the pruning property); a
    // lexicographic sort would give full-range y-spans in every x-slice.
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val z = grid.map { case (x, y) => (x, y, ref(x, y, 21)) }
      .sortBy(_._3).grouped(64).toSeq
    z.foreach { chunk =>
      val xs = chunk.map(_._1); val ys = chunk.map(_._2)
      assert(xs.max - xs.min <= 8 && ys.max - ys.min <= 8,
        s"chunk spans x=[${xs.min},${xs.max}] y=[${ys.min},${ys.max}]")
    }
  }
}
