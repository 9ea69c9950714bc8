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
}
