package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Fixed-point PageRank: hand-computed chains, teleport floor, dangling
  * leak, determinism under repartitioning. */
class WebGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)], iters: Int)
      : Map[String, Long] =
    WebGraph.pageRank(edges.toDF("src", "dst", "w"), iters = iters)
      .as[(String, Long)].collect().toMap

  test("two-node chain matches the hand-computed fixed-point rounds") {
    // a→b only. Round 1: a = teleport; b = 150000 + 85%·(a's full mass).
    val r1 = ranks(Seq(("a", "b", 1L)), iters = 1)
    assert(r1 == Map("a" -> 150000L, "b" -> 1000000L))
    // Round 2: a's contribution is now its teleport floor.
    val r2 = ranks(Seq(("a", "b", 1L)), iters = 2)
    assert(r2 == Map("a" -> 150000L,
      "b" -> (150000L + (85L * 150000L) / 100)))
  }

  test("weighted split: contributions proportional to edge weight") {
    // a→b (w=3), a→c (w=1): b gets 3/4 of a's damped mass, c gets 1/4.
    val r = ranks(Seq(("a", "b", 3L), ("a", "c", 1L)), iters = 1)
    assert(r("a") == 150000L)
    assert(r("b") == 150000L + (85L * ((1000000L * 3) / 4)) / 100)
    assert(r("c") == 150000L + (85L * ((1000000L * 1) / 4)) / 100)
  }

  test("dangling node keeps rank but leaks mass (classic iteration)") {
    // b has only in-links: it ranks, but contributes nothing onward —
    // total mass shrinks, nobody inherits b's rank.
    val r = ranks(Seq(("a", "b", 1L), ("b2", "a", 1L)), iters = 3)
    assert(r.keySet == Set("a", "b", "b2"))
    assert(r("b2") == 150000L) // no in-links: pinned at teleport
    assert(r("b") > r("a"))    // b inherits a's mass + a inherits only b2's floor
  }

  test("self-loop cycle conserves damped mass exactly in fixed point") {
    // a→b→a: symmetric 2-cycle; both nodes stay at full mass every round
    // (teleport + 85% of the other's full mass = 1000000 exactly).
    val r = ranks(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 4)
    assert(r == Map("a" -> 1000000L, "b" -> 1000000L))
  }

  test("rank is independent of input partitioning") {
    val edges = (0L until 200L)
      .map(i => (s"h${i % 17}", s"h${(i * 13 + 5) % 23}", 1L + i % 3))
    val one = WebGraph.pageRank(
      WebGraph.hostLinkGraph(edges.toDF("src_host", "dst_host", "x")
        .select(col("src_host"), col("dst_host"))), iters = 3)
      .as[(String, Long)].collect().toMap
    val other = WebGraph.pageRank(
      WebGraph.hostLinkGraph(edges.toDF("src_host", "dst_host", "x")
        .select(col("src_host"), col("dst_host")).repartition(7)), iters = 3)
      .as[(String, Long)].collect().toMap
    assert(one == other) // integer arithmetic: order-independent sums
  }
}
