package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sorted distinct 64-bit word n-gram shingle hashes from a token array,
  * in ONE compiled O(tokens) pass.
  *
  * Value-identical to the higher-order-function formulation
  * `sort_array(array_distinct(transform(seq, i -> xxhash64(h_i..h_{i+n-1}))))`
  * over `transform(toks, t -> xxhash64(t))` (asserted in ExpressionsSpec):
  * per-token hash is XXH64 over the UTF-8 bytes at seed 42, and the gram
  * hash chains the n token hashes through XXH64.hashLong exactly as
  * Spark's multi-arg `xxhash64` does. The HOF version is O(tokens²)
  * INTERPRETED — lambdas don't participate in codegen, and every
  * `element_at(hs, ·)` reference re-evaluates the whole inner transform
  * because common-subexpression elimination cannot reach inside lambda
  * bodies. At 5k docs that was ~44M interpreted hash evaluations and the
  * single largest cost in the dedup family (q31/q72/q91/q79).
  *
  * The shingle STRING is never materialized; output is ascending and
  * duplicate-free, ready for [[SortedIntersectCount]] linear merges.
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(toks: Any): Any =
    HashedShingles.compute(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashedShingles.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): HashedShingles = copy(child = newChild)
}

object HashedShingles {
  private final val Seed = 42L // Spark's xxhash64 default seed

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      // null element: hash stays at the seed — exactly Spark's xxhash64
      // null-skip semantics, keeping the documented HOF value parity for
      // token arrays that carry nulls (unreachable from split(), but the
      // expression is public)
      th(i) = if (s == null) Seed
      else XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
      i += 1
    }
    val k = m - n + 1
    val g = new Array[Long](k)
    i = 0
    while (i < k) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      g(i) = h
      i += 1
    }
    java.util.Arrays.sort(g)
    var w = 1
    var r = 1
    while (r < k) {
      if (g(r) != g(w - 1)) { g(w) = g(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == k) g else java.util.Arrays.copyOf(g, w))
  }
}
