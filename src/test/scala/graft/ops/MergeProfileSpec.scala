package graft.ops

import graft.SparkSpec

/** Merge-upsert semantics and single-pass profiling. */
class MergeProfileSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: matched updates, unmatched survives, new inserts, null keeps base") {
    val base = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), Some(20L)),
      (3L, Some("c"), Some(30L))
    ).toDF("k", "name", "v")
    val delta = Seq(
      (2L, Some("B"), None: Option[Long]), // partial row: v stays 20
      (4L, Some("d"), Some(40L)) // insert
    ).toDF("k", "name", "v")
    val got = Merge.upsert(base, delta, Seq("k"))
      .as[(Long, Option[String], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, Some("a"), Some(10L)), // untouched base row
      (2L, Some("B"), Some(20L)), // updated name, null delta col kept base
      (3L, Some("c"), Some(30L)),
      (4L, Some("d"), Some(40L)))) // inserted
  }

  test("SCD type-2: close-and-open, keep, insert, history passthrough") {
    val base = Seq(
      (1L, "gold", "d1", Some("d2")), // history row: untouched
      (1L, "plat", "d2", None), // current, delta changes it
      (2L, "silver", "d1", None), // current, delta identical -> kept
      (3L, "bronze", "d1", None) // current, no delta -> kept
    ).toDF("k", "tier", "valid_from", "valid_to")
    val delta = Seq(
      (1L, "diamond", "d3"),
      (2L, "silver", "d3"),
      (4L, "new", "d3") // unseen key -> first version
    ).toDF("k", "tier", "eff")
    val got = Scd.applyType2(base, delta, Seq("k"), Seq("tier"), "eff")
      .as[(Long, String, String, Option[String])].collect().toSet
    assert(got == Set(
      (1L, "gold", "d1", Some("d2")),
      (1L, "plat", "d2", Some("d3")), // closed by the change
      (1L, "diamond", "d3", None), // opened
      (2L, "silver", "d1", None), // unchanged delta -> kept as-is
      (3L, "bronze", "d1", None), // no delta -> kept
      (4L, "new", "d3", None))) // inserted
  }

  test("SCD type-2 compares multiple attrs null-safely") {
    val base = Seq((1L, Some("a"), Some(10L), "d1", None: Option[String]))
      .toDF("k", "x", "y", "valid_from", "valid_to")
    // y flips 10 -> null: a change under null-safe comparison
    val delta = Seq((1L, Some("a"), None: Option[Long], "d2"))
      .toDF("k", "x", "y", "eff")
    val got = Scd.applyType2(base, delta, Seq("k"), Seq("x", "y"), "eff")
      .as[(Long, Option[String], Option[Long], String, Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, Some("a"), Some(10L), "d1", Some("d2")),
      (1L, Some("a"), None, "d2", None)))
  }

  test("profile handles an all-null column") {
    val df = Seq((1L, None: Option[String]), (2L, None))
      .toDF("id", "dead")
    val got = Profile.profile(df, Seq("dead"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().head
    assert(got == ("dead", 2L, 2L, 0L, None, None))
  }

  test("profile counts rows, nulls, distincts, min/max in one pass") {
    val df = Seq(
      (Some(1L), Some("x")),
      (Some(2L), None),
      (None, Some("y")),
      (Some(2L), Some("x"))
    ).toDF("num", "str")
    val got = Profile.profile(df, Seq("num", "str"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("num") == ("num", 4L, 1L, 2L, Some("1"), Some("2")))
    assert(got("str") == ("str", 4L, 1L, 2L, Some("x"), Some("y")))
  }
}
