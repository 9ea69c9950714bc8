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

  private def refN(xs: Seq[Long], bits: Int): Long = {
    val n = xs.size
    (0 until bits).foldLeft(0L) { (acc, i) =>
      xs.zipWithIndex.foldLeft(acc) { case (a, (x, j)) =>
        a | ((x >> i) & 1L) << (i * n + j)
      }
    }
  }

  test("zValueN matches the round-robin interleave reference (3 and 4 dims)") {
    val cases3 = Seq(Seq(0L, 0L, 0L), Seq(1L, 0L, 0L), Seq(0L, 1L, 0L),
      Seq(0L, 0L, 1L), Seq(5L, 3L, 7L), Seq(1048575L, 77L, 123456L))
    val got3 = cases3.map(c => (c(0), c(1), c(2))).toDF("a", "b", "c")
      .select(ZOrder.zValueN(Seq(col("a"), col("b"), col("c")), 21).as("z"))
      .as[Long].collect()
    got3.zip(cases3).foreach { case (z, xs) =>
      assert(z == refN(xs, 21), s"for $xs")
    }
    val cases4 = Seq(Seq(9L, 4L, 2L, 15L), Seq(32767L, 1L, 0L, 32767L))
    val got4 = cases4.map(c => (c(0), c(1), c(2), c(3))).toDF("a", "b", "c", "d")
      .select(ZOrder.zValueN(
        Seq(col("a"), col("b"), col("c"), col("d")), 15).as("z"))
      .as[Long].collect()
    got4.zip(cases4).foreach { case (z, xs) =>
      assert(z == refN(xs, 15), s"for $xs")
    }
  }

  test("zValue2 delegates consistently and zValueN rejects overflow widths") {
    val z2 = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.zValue2(col("a"), col("b")).as("z")).as[Long].collect()
    assert(z2.head == refN(Seq(5L, 3L), 21))
    intercept[IllegalArgumentException] {
      ZOrder.zValueN(Seq(col("a"), col("b"), col("c")), 22) // 66 bits
    }
    intercept[IllegalArgumentException] {
      ZOrder.zValueN(Seq(col("a")), 21) // one column is not an interleave
    }
  }

  test("3-D z-sorted layout clusters every dimension into chunks") {
    // 16x16x16 cube z-sorted and cut into 64 chunks of 64: every chunk
    // must span a bounded sub-box of ALL THREE dimensions
    val cube = for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L)
      yield Seq(x, y, z)
    val sorted = cube.map(p => (p, refN(p, 21))).sortBy(_._2).grouped(64).toSeq
    sorted.foreach { chunk =>
      (0 until 3).foreach { d =>
        val vs = chunk.map(_._1(d))
        assert(vs.max - vs.min <= 4,
          s"chunk spans dim$d=[${vs.min},${vs.max}]")
      }
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
