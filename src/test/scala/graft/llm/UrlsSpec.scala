package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** URL canonicalization rules, one by one, plus the dedup grouping. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalizeUrl(col("u"))).as[String]
      .collect().toSeq

  test("scheme/host lowercase, default port strip, fragment drop") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b#frag")
      == Seq("http://www.example.com/A/b")) // path case PRESERVED
    assert(canon("https://ex.com:443/x") == Seq("https://ex.com/x"))
    // non-default ports survive; the other scheme's default is not ours
    assert(canon("http://ex.com:8080/x") == Seq("http://ex.com:8080/x"))
    assert(canon("http://ex.com:443/x") == Seq("http://ex.com:443/x"))
  }

  test("empty path becomes /; query rules: strip, sort, drop empty ?") {
    assert(canon("http://ex.com") == Seq("http://ex.com/"))
    assert(canon("http://ex.com?b=2&a=1") == Seq("http://ex.com/?a=1&b=2"))
    assert(canon("http://ex.com/p?utm_source=n&b=2&fbclid=Z&a=1")
      == Seq("http://ex.com/p?a=1&b=2"))
    // query emptied entirely → no '?' at all
    assert(canon("http://ex.com/p?utm_campaign=x&gclid=1")
      == Seq("http://ex.com/p"))
    // utm_ prefix only — 'utmost=1' is a real parameter
    assert(canon("http://ex.com/p?utmost=1") == Seq("http://ex.com/p?utmost=1"))
  }

  test("different spellings of one page collapse; different pages don't") {
    val same = canon(
      "HTTP://Ex.COM:80/p?b=2&a=1#x",
      "http://ex.com/p?a=1&utm_source=s&b=2")
    assert(same.distinct.size == 1)
    assert(canon("http://ex.com/p", "https://ex.com/p").distinct.size == 2)
  }

  test("blocklist: suffix semantics, exact host, multi-rule min, clean " +
    "rows carried") {
    val docs = Seq(
      (1L, "ads.bad.example"),     // subdomain of rule "bad.example"
      (2L, "bad.example"),         // the rule host itself
      (3L, "notbad.example"),      // NOT a dot-suffix — must stay clean
      (4L, "x.ads.bad.example"),   // deeper subdomain, two rules match:
                                   // min picks "ads.bad.example"
      (5L, "clean.example")
    ).toDF("doc_id", "host")
    val rules = Seq("bad.example", "ads.bad.example").toDF("rule")
    val out = Urls.blocklistFilter(docs, col("host"), col("doc_id"), rules)
      .select("doc_id", "blocked", "rule")
      .as[(Long, Boolean, Option[String])].collect().toSet
    assert(out == Set(
      (1L, true, Some("ads.bad.example")),
      (2L, true, Some("bad.example")),
      (3L, false, None),
      (4L, true, Some("ads.bad.example")),
      (5L, false, None)))
  }

  test("canonicalDedup groups spellings and picks the min-id keeper") {
    val df = Seq(
      (10L, "http://ex.com/p?a=1"),
      (11L, "HTTP://EX.com:80/p?a=1&utm_source=x"),
      (12L, "http://ex.com/q"))
      .toDF("doc_id", "url")
    val out = Urls.canonicalDedup(df, col("url"), col("doc_id"))
      .select("doc_id", "keep_id", "n_spellings")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((10L, 10L, 2L), (11L, 10L, 2L), (12L, 12L, 1L)))
  }
}
