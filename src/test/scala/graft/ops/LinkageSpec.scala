package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Fellegi-Sunter linkage: multi-pass blocking recall/dedup and the
  * integer log-odds decision, including the null-as-disagree rule. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    Linkage.Field("name", col("a_name") === col("b_name"), 9892L, -4320L),
    Linkage.Field("city", col("a_city") === col("b_city"), 2293L, -5322L))

  test("blocked candidates: union of passes, each pair exactly once") {
    // pair (1, 11) blocks on BOTH keys — must appear once; (2, 12) only
    // on city; (3, 13) only on name; 4/14 share nothing
    val a = Seq((1L, "ann", "rome"), (2L, "bob", "oslo"),
        (3L, "cyd", "kiev"), (4L, "dee", "lima"))
      .toDF("id_a", "a_name", "a_city")
    val b = Seq((11L, "ann", "rome"), (12L, "boz", "oslo"),
        (13L, "cyd", "bern"), (14L, "eve", "baku"))
      .toDF("id_b", "b_name", "b_city")
    val cand = Linkage.blockedCandidates(a, b, Seq(
      (col("a_name"), col("b_name")), (col("a_city"), col("b_city"))))
    val pairs = cand.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSeq.sorted
    assert(pairs == Seq((1L, 11L), (2L, 12L), (3L, 13L)))
  }

  test("scoring: agree/disagree weights sum; threshold decides") {
    val cand = Seq(
      (1L, 11L, "ann", "ann", "rome", "rome"), // both agree: 12185
      (2L, 12L, "bob", "bob", "oslo", "bern"), // name only: 4570
      (3L, 13L, "cyd", "dee", "kiev", "kiev")  // city only: -2027
    ).toDF("id_a", "id_b", "a_name", "b_name", "a_city", "b_city")
    val out = Linkage.fellegiSunter(cand, fields, threshold = 4000L)
      .orderBy("id_a")
      .select("score_milli", "matched").as[(Long, Boolean)].collect().toSeq
    assert(out == Seq((12185L, true), (4570L, true), (-2027L, false)))
  }

  test("sorted neighborhood: all and only pairs within w positions, " +
    "across block boundaries, partitioning-independent") {
    // 20 records with distinct sort values: rank i pairs with ranks
    // i+1..i+w-1 exactly
    val recs = (0L until 20L).map(i => (i, 100L - i)).toDF("rid", "v")
    def run(parts: Int) = Linkage.sortedNeighborhood(
        recs.repartition(parts), col("rid"), col("v"),
        expr("v div 4"), w = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // v = 100-i descending in i: rank of rid i is i+1; pairs are
    // (i, j) with 0 < j - i < 4
    val want = (for {
      i <- 0L until 20L; j <- i + 1 until math.min(i + 4, 20L)
    } yield (i, j)).toSet
    assert(run(1) == want)
    assert(run(7) == want)
  }

  test("null field value scores as disagree, not null score") {
    val cand = Seq((1L, 11L, Some("ann"), Option.empty[String],
        Some("rome"), Some("rome")))
      .toDF("id_a", "id_b", "a_name", "b_name", "a_city", "b_city")
    val out = Linkage.fellegiSunter(cand, fields, threshold = 0L)
      .select("agree_name", "score_milli").as[(Boolean, Long)].head()
    assert(out == ((false, -4320L + 2293L)))
  }
}
