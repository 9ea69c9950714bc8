package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of a token array's unigram distribution (nats),
  * UNROUNDED, as a native codegen expression — the compiled kernel
  * behind [[graft.llm.TextAnalysis.tokenEntropy]]. The HOF spelling
  * (count-per-distinct-token via `filter` inside `transform`) is
  * O(distinct·len) with every lambda interpreted — it measured ~11 s of
  * q120's 100× cell; this is one hash-count pass plus one sorted fold.
  *
  * Value parity with the HOF (asserted in ExpressionsSpec): the ln terms
  * accumulate over tokens in BINARY-SORTED order — the same order the
  * HOF folds (array_sort ∘ array_distinct) and the same order the DuckDB
  * oracle folds (list_sort ∘ list_distinct), so the float sum is
  * bit-identical, not merely close (`ln` is `StrictMath.log`, exactly
  * what Spark's `log` expression calls). Null elements are out of
  * contract (split() output never contains them; the HOF spelling
  * NaN-poisons on them) — this expression skips them. */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any =
    TokenEntropy.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)
}

object TokenEntropy {
  /** Static helper shared by eval and generated code. */
  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n == 0) return -0.0 // the HOF's empty fold: round(-0.0·…) shape
    val counts = new mutable.HashMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // clone: the scan reuses UTF8String buffers
        val t = arr.getUTF8String(i)
        counts.get(t) match {
          case Some(c) => counts.update(t, c + 1)
          case None => counts.update(t.clone(), 1L)
        }
      }
      i += 1
    }
    val keys = counts.keysIterator.toArray
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    val nD = n.toDouble
    var acc = 0.0
    var j = 0
    while (j < keys.length) {
      // same ops, same order as the HOF fold: (c/n)·ln(c/n) ascending
      // by binary token order; ln is StrictMath.log == Spark's `log`
      val p = counts(keys(j)) / nD
      acc += p * StrictMath.log(p)
      j += 1
    }
    -acc
  }
}
