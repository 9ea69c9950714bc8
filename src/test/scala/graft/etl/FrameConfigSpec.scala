package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.SparkSpec

/** Null-on-error extraction semantics (reference testpilot_data.py:53-66):
  * any malformed cell degrades to NULL, never throws. */
class FrameConfigSpec extends SparkSpec {
  import spark.implicits._

  test("try_cast null-on-error: garbage -> null, valid -> value") {
    val df = Seq("42", "x", "", "7").toDF("raw")
    val cfg = FrameConfig(Seq(
      ColumnSpec("v", col("raw"), castTo = Some(LongType))))
    val out = cfg(df).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(42L), None, None, Some(7L)))
  }

  test("path() resolves /-separated nested struct paths") {
    val df = Seq(("a", ("b", 3L))).toDF("x", "y")
      .select(col("x"), struct(col("y._1").as("p"), col("y._2").as("q")).as("y"))
    val out = df.select(ColumnSpec.path("y/q")).as[Long].head()
    assert(out == 3L)
  }

  test("missing paths extract as typed NULL, not AnalysisException") {
    // reference: get_pings_properties fills absent paths with None
    val df = Seq(("a", 1L)).toDF("x", "n")
    val cfg = FrameConfig(Seq(
      ColumnSpec("x", col("x")),
      ColumnSpec("gone", ColumnSpec.path("meta/geo")),
      ColumnSpec("gone_typed", col("absent"), castTo = Some(LongType))))
    val out = cfg(df)
    assert(out.schema("gone_typed").dataType == LongType)
    val row = out.head()
    assert(row.getString(0) == "a" && row.isNullAt(1) && row.isNullAt(2))
  }

  test("pre/post filters apply around the projection") {
    val df = Seq(("keep", "1"), ("drop", "2"), ("keep", "x")).toDF("tag", "v")
    val cfg = FrameConfig(
      Seq(ColumnSpec("v", col("v"), castTo = Some(LongType))),
      preFilter = Some(col("tag") === "keep"),
      postFilter = Some(col("v").isNotNull))
    assert(cfg(df).as[Long].collect().toSeq == Seq(1L))
  }

  test("splitHead takes prefix before delimiter; null-safe") {
    val df = Seq(Some("a|b|c"), Some("plain"), None).toDF("s")
    val out = df.select(Clean.splitHead("|")(col("s"))).collect()
      .map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("a"), Some("plain"), None))
  }

  test("stripPadAndTrim drops NUL padding and 4-byte head/tail") {
    val df = Seq("XXXXpayloadYYYY\u0000\u0000", "tiny").toDF("s")
    val out = df.select(Clean.stripPadAndTrim(col("s"))).collect()
      .map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("payload"), None))
  }

  test("isValidUuid accepts UUIDs, rejects garbage") {
    val df = Seq("123e4567-e89b-12d3-a456-426614174000", "nope").toDF("s")
    val out = df.select(Clean.isValidUuid(col("s"))).collect()
      .map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, false))
  }
}
