package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Skyline: dominance semantics, tie survival, and the distributive
  * two-phase property (partitioning-independence). */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sky(rows: Seq[(Long, Long, Long)], parts: Int) =
    Skyline.skyline(
        rows.toDF("id", "a", "b").repartition(parts),
        col("id"), Seq(col("a"), col("b")))
      .select("id").as[Long].collect().toSet

  test("frontier kept, dominated dropped, equal points both survive") {
    val rows = Seq(
      (1L, 10L, 1L),  // frontier (best a)
      (2L, 1L, 10L),  // frontier (best b)
      (3L, 5L, 5L),   // frontier (incomparable to 1 and 2)
      (4L, 4L, 4L),   // dominated by 3
      (5L, 10L, 1L),  // tie of 1 on both metrics: survives
      (6L, 10L, 0L))  // dominated by 1 (equal a, worse b)
    assert(sky(rows, 1) == Set(1L, 2L, 3L, 5L))
  }

  test("result is partitioning-independent on random data") {
    val rows = (0L until 300L).map { i =>
      (i, (i * 37) % 101, (i * 53) % 97)
    }
    assert(sky(rows, 1) == sky(rows, 13))
    // brute-force reference
    val want = rows.filter { r =>
      !rows.exists(s => s._2 >= r._2 && s._3 >= r._3 &&
        (s._2 > r._2 || s._3 > r._3))
    }.map(_._1).toSet
    assert(sky(rows, 7) == want)
  }

  test("anti-correlated metrics (every row on the frontier) survive the " +
    "tree merge at high partition counts") {
    // a = i, b = -i: no row dominates any other, so every local skyline
    // is its whole partition — the case the single-task merge choked on;
    // 65 partitions forces ≥2 coalesce rounds at fanIn 8
    val rows = (0L until 300L).map(i => (i, i, 300L - i))
    assert(sky(rows, 65) == rows.map(_._1).toSet)
    assert(sky(rows, 1) == sky(rows, 65))
  }
}
