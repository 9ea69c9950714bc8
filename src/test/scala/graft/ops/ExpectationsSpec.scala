package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Expectations.{RowCheck, UniqueCheck}

/** Expectation semantics: violation counting, null handling, uniqueness. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(60.0), "b"),  // range violation
    (3L, None, "c"),        // null predicate -> violation
    (3L, Some(20.0), "d"),  // duplicate id
    (4L, Some(30.0), "e")
  ).toDF("id", "v", "tag")

  test("row checks count violations; null predicates are violations") {
    val out = Expectations.check(frame, Seq(
        RowCheck("v_in_range", col("v").between(0.0, 50.0)),
        RowCheck("id_positive", col("id") > 0)))
      .orderBy("check_name")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("id_positive", 0L, true),
      ("v_in_range", 2L, false))) // the 60.0 row AND the null row
  }

  test("uniqueness counts surplus rows per duplicated key") {
    val out = Expectations.check(frame, Nil, Seq(
        UniqueCheck("id_unique", Seq("id")),
        UniqueCheck("id_tag_unique", Seq("id", "tag"))))
      .orderBy("check_name")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("id_tag_unique", 0L, true),
      ("id_unique", 1L, false))) // id=3 appears twice -> 1 surplus row
  }

  test("row checks compile to a single aggregation pass") {
    val df = Expectations.check(frame, Seq(
      RowCheck("a", col("id") > 0), RowCheck("b", col("v").isNotNull)))
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, df.queryExecution.optimizedPlan.toString)
  }
}
