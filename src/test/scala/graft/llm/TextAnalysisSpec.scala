package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** stripHtml extraction semantics (the rest of TextAnalysis is covered
  * through its oracle-checked queries: q36/q37/q38/q49). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(TextAnalysis.stripHtml(col("h")))
      .as[String].head()

  test("script and style payloads are dropped, tag text survives") {
    val out = strip(
      """<html><head><script>var hidden = "secret";</script>
        |<style>.x { color: red }</style></head>
        |<body><h1>Title</h1><p>Body text.</p></body></html>""".stripMargin)
    assert(out == "Title Body text.")
    assert(!out.contains("secret") && !out.contains("color"))
  }

  test("multiline script blocks are dropped ((?s) dotall)") {
    assert(strip("<p>a</p><script>\nline1\nline2\n</script><p>b</p>")
      == "a b")
  }

  test("entities decode once, &amp; last — no double decoding") {
    // &amp;lt; must yield the literal string "&lt;", not "<"
    assert(strip("x &amp;lt; y") == "x &lt; y")
    assert(strip("a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp; g")
      == "a <b> \"c\" 'd' e f & g")
  }

  test("unmapped entities pass through; whitespace collapses") {
    assert(strip("<div>  a   &copy;\n\n b  </div>") == "a &copy; b")
  }

  private def entropy(text: String): Double =
    Seq(text).toDF("t")
      .withColumn("toks", TextAnalysis.tokens(col("t")))
      .select(TextAnalysis.tokenEntropy(col("toks")))
      .as[Double].head()

  test("tokenEntropy: zero for constant, ln(k) for uniform, hand value") {
    assert(entropy("spam spam spam spam") == 0.0)
    val u4 = entropy("a b c d") // uniform over 4 -> ln 4
    assert(math.abs(u4 - math.log(4)) < 1e-4)
    // 3:1 mix: -(0.75 ln 0.75 + 0.25 ln 0.25)
    val expect = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(entropy("x x x y") - expect) < 1e-4)
    // repetitive text scores strictly below diverse text of equal length
    assert(entropy("a a b b c c d d") < entropy("a b c d e f g h"))
  }

  test("unicode hygiene: NFC composes, mojibake counted and repaired, " +
    "controls stripped, whitespace collapsed, clean text untouched") {
    val rows = Seq(
      (1L, "cafe\u0301 time"),                      // NFD e + U+0301
      (2L, "caf\u00c3\u00a9 and na\u00c3\u00afve"), // 1 known mojibake
      (3L, "ab\u0007\u0001c"),                     // C0 controls
      (4L, "too   many  spaces "),
      (5L, "already clean text"))
      .toDF("doc_id", "text")
    val (cleaned, nMoj) = TextAnalysis.unicodeHygiene(col("text"))
    val out = rows.select(col("doc_id"), cleaned.as("c"),
        nMoj.as("m"), (cleaned =!= col("text")).as("ch"))
      .orderBy("doc_id")
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(out(0) == ((1L, "caf\u00e9 time", 0L, true)))
    // the A-diaeresis+macron pattern of "na\u00c3\u00afve" is NOT in
    // the fix table: only the e-acute fix fires, the unknown sequence
    // passes through
    assert(out(1)._2 == "caf\u00e9 and na\u00c3\u00afve" && out(1)._3 == 1L)
    assert(out(2) == ((3L, "abc", 0L, true)))
    assert(out(3) == ((4L, "too many spaces", 0L, true)))
    assert(out(4) == ((5L, "already clean text", 0L, false)))
  }

  test("gopher repetition: top-gram and dup-gram signals, count-1 scores " +
    "0, short docs pass with all zeros") {
    val mk = (id: Long, t: String) => (id, t, t.length.toLong)
    val docs = Seq(
      // "ab ab ab ab ab": top2 = 4·len("ab ab")=20 of 14 chars -> 14286bp
      mk(1L, "ab ab ab ab ab"),
      // one repeated 5-gram: dup5 = 1·len("a b c d e")=9 of 21 -> 4286bp
      mk(2L, "a b c d e a b c d e x"),
      mk(3L, "w1 w2 w3 w4 w5 w6 w7"), // all distinct: zeros, passes
      mk(4L, "x y")                    // count-1 top 2-gram: 0, passes
    ).toDF("doc_id", "text", "n_chars")
    val out = TextAnalysis.gopherRepetition(docs).orderBy("doc_id")
      .select("doc_id", "top2_bp", "top3_bp", "top4_bp", "dup5_bp",
        "dup6_bp", "passed")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out(0) == ((1L, math.round(20 * 10000.0 / 14),
      math.round(24 * 10000.0 / 14), math.round(22 * 10000.0 / 14),
      0L, 0L, false)))
    assert(out(1)._1 == 2L && out(1)._5 == math.round(9 * 10000.0 / 21)
      && !out(1)._7)
    assert(out(2) == ((3L, 0L, 0L, 0L, 0L, 0L, true)))
    assert(out(3) == ((4L, 0L, 0L, 0L, 0L, 0L, true)))
  }
}
