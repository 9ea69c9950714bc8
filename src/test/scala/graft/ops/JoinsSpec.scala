package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** As-of join semantics: nearest predecessor, at-or-before ties,
  * left-outer nulls, payload carry. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3") // before any signup for user 2
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "s_early"),
      (1L, ts("2024-01-01 10:00:00"), "s_exact"), // ties p1's time: matches
      (1L, ts("2024-01-01 11:00:00"), "s_late"),
      (2L, ts("2024-01-01 23:00:00"), "s_after")
    ).toDF("user_id", "ts", "name")

    val out = Joins.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("name"))
      .select(col("tag"), col("asof_name"))
      .as[(String, Option[String])].collect().toMap

    assert(out("p1").contains("s_exact")) // at-or-before includes equal ts
    assert(out("p2").contains("s_late")) // nearest predecessor, not first
    assert(out("p3").isEmpty) // left-outer: no predecessor -> null
  }

  test("asOf with an empty right side keeps all left rows with nulls") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p1")).toDF("user_id", "ts", "tag")
    val right = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("user_id", "ts", "name")
    val out = Joins.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("name"))
      .select(col("tag"), col("asof_name")).as[(String, Option[String])]
      .collect().toSeq
    assert(out == Seq(("p1", None)))
  }

  test("asOf is deterministic on equal right timestamps") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a"),
      (1L, ts("2024-01-01 09:00:00"), "b")
    ).toDF("user_id", "ts", "name")
    val got = (1 to 3).map { _ =>
      Joins.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("name"))
        .select("asof_name").as[String].head()
    }
    assert(got.distinct.size == 1)
    assert(got.head == "b") // largest payload struct wins the tie
  }
}
