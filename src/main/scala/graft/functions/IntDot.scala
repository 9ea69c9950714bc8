package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot product of two int-array columns as a native codegen
  * expression — the per-pair kernel of the quantized similarity path
  * ([[graft.llm.Similarity.quantizedTopK]]). The HOF spelling
  * (`aggregate(zip_with(...))`) runs its lambdas interpreted per element
  * and measured ~4× slower at 200k vectors (the same compiled-vs-HOF gap
  * as ShingleMinHash and HashedShingles); this is one tight loop over
  * the unsafe array data, no per-pair allocation. Value-identical to the
  * HOF fold by construction (exact integer arithmetic, asserted in
  * ExpressionsSpec). Null on length mismatch. */
case class IntDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  // can produce null on length mismatch even for non-null children
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    IntDot.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      // freshName: two int_dot calls can land in one generated scope (e.g.
      // a projection using the registered SQL function twice) — a literal
      // variable name would be a Janino duplicate-declaration error and
      // force fallback to the interpreted path
      val res = ctx.freshName("intDotResult")
      s"""
         |Long $res = graft.functions.IntDot.compute($l, $r);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  /** Static helper shared by eval and generated code. Boxed return encodes
    * the length-mismatch null. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    dot
  }
}
