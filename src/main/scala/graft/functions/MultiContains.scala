package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct-presence multi-pattern matcher: which of a fixed dictionary's
  * terms occur in `text` as a SUBSTRING — the C4/RefinedWeb badword /
  * blocked-phrase content gate, compiled. One Aho–Corasick 1975 DFA pass
  * over the row's UTF-8 bytes finds all D dictionary terms simultaneously
  * (O(len + hits)), where the naive spelling — and the DuckDB oracle — is
  * D independent `contains` scans (O(D·len)); at a production blocklist
  * size (hundreds–thousands of phrases) the naive gate dominates the whole
  * cleaning pipeline, the automaton is scan-speed and flat in D.
  *
  * Byte-level automaton: matching runs on raw UTF-8 bytes, so any-language
  * patterns work unchanged (UTF-8 substring equality IS byte substring
  * equality). Output is the matched terms in ascending lexicographic
  * (binary) order — a pure function of (text, dictionary), independent of
  * match positions, so the DuckDB twin `list_filter(dict, p ->
  * contains(text, p))` over the sorted literal list replays it exactly.
  * The automaton is memoized per dictionary per JVM (executors rebuild it
  * from the literal — nothing ships but the pattern strings).
  */
case class MultiContains(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "MultiContains needs a non-empty dictionary of non-empty patterns")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  @transient private lazy val automaton = AhoCorasick.forPatterns(patterns)

  override protected def nullSafeEval(input: Any): Any =
    automaton.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ac.run($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiContains = copy(child = newChild)
}

/** The built automaton: a dense byte-alphabet DFA (goto with fail links
  * folded in at build time) plus per-state match bitsets (outputs OR'd
  * down suffix links), so the scan is two array reads per input byte and
  * zero branching on misses. States are trie nodes over the deduplicated,
  * binary-sorted pattern list; pattern ids are positions in that sorted
  * list, so emitting set bits in id order yields sorted output for free.
  */
final class AhoCorasick private (
    private val dfa: Array[Int],          // states × 256, fail folded in
    private val outBits: Array[Long],     // states × words, suffix-closed
    private val words: Int,               // longs per state bitset
    private val sorted: Array[UTF8String] // dedup'd patterns, binary order
) extends Serializable {

  /** Sorted distinct dictionary terms present in `text` as substrings. */
  def run(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val hits = new Array[Long](words)
    var state = 0
    var i = 0
    while (i < bytes.length) {
      state = dfa((state << 8) | (bytes(i) & 0xff))
      val base = state * words
      var w = 0
      while (w < words) { hits(w) |= outBits(base + w); w += 1 }
      i += 1
    }
    var n = 0
    var w = 0
    while (w < words) { n += java.lang.Long.bitCount(hits(w)); w += 1 }
    val out = new Array[Any](n)
    var k = 0
    var id = 0
    while (k < n) {
      if ((hits(id >> 6) & (1L << (id & 63))) != 0) { out(k) = sorted(id); k += 1 }
      id += 1
    }
    new GenericArrayData(out)
  }
}

object AhoCorasick {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], AhoCorasick]()

  def forPatterns(patterns: Seq[String]): AhoCorasick =
    cache.computeIfAbsent(patterns, build(_))

  private[graft] def build(patterns: Seq[String]): AhoCorasick = {
    val sorted = patterns.distinct.map(UTF8String.fromString)
      .sortWith(_.compareTo(_) < 0).toArray
    val pats = sorted.map(_.getBytes)
    val words = (sorted.length + 63) >> 6

    // Trie over pattern bytes. goto = -1 where no edge.
    val maxNodes = 1 + pats.map(_.length).sum
    val goto = Array.fill(maxNodes << 8)(-1)
    val out = new Array[Long](maxNodes * words)
    var nNodes = 1
    var id = 0
    while (id < pats.length) {
      val p = pats(id)
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p(i) & 0xff
        if (goto((s << 8) | c) < 0) { goto((s << 8) | c) = nNodes; nNodes += 1 }
        s = goto((s << 8) | c)
        i += 1
      }
      out(s * words + (id >> 6)) |= 1L << (id & 63)
      id += 1
    }

    // BFS: fail links, fold into a DFA, OR outputs down suffix links.
    val fail = new Array[Int](nNodes)
    val dfa = new Array[Int](nNodes << 8)
    val queue = new java.util.ArrayDeque[Integer]()
    var c = 0
    while (c < 256) {
      val nxt = goto(c) // root's edges
      if (nxt < 0) dfa(c) = 0
      else { dfa(c) = nxt; fail(nxt) = 0; queue.add(nxt) }
      c += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      var w = 0
      while (w < words) { out(s * words + w) |= out(fail(s) * words + w); w += 1 }
      var b = 0
      while (b < 256) {
        val nxt = goto((s << 8) | b)
        if (nxt < 0) dfa((s << 8) | b) = dfa((fail(s) << 8) | b)
        else {
          dfa((s << 8) | b) = nxt
          fail(nxt) = dfa((fail(s) << 8) | b)
          queue.add(nxt)
        }
        b += 1
      }
    }
    new AhoCorasick(dfa, java.util.Arrays.copyOf(out, nNodes * words),
      words, sorted)
  }
}
