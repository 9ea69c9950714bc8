package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity between two float-array embeddings, as a codegen'd
  * Catalyst expression (SURVEY.md §7.4: "custom `Expression` w/ codegen only
  * for perf" — this is that perf path; the composable baseline uses
  * `zip_with`/`aggregate` higher-order functions).
  *
  * Both the dot product and the norms are accumulated in double over the
  * primitive float arrays — one pass, no per-element Column-expression
  * overhead, stays inside whole-stage codegen via a single static call.
  * Returns null when lengths differ or either norm is zero.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSim.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      // freshName: two cosine_sim calls in one generated scope would
      // otherwise collide on a literal variable name (Janino duplicate
      // declaration → interpreted fallback)
      val res = ctx.freshName("cosineSimResult")
      s"""
         |Double $res = graft.functions.CosineSim.compute($l, $r);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Static helper shared by eval and generated code. Boxed return encodes
    * the null case (length mismatch / zero norm). */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // element access without materializing float arrays: this runs once
      // per candidate PAIR (O(n^2) call sites), so per-call allocation
      // would dominate the runtime
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
