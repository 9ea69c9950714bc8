package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial fingerprint of a string: fold codepoints through
  * `acc = (acc * 31 + cp) mod (2^31 - 1)`, seeded with the first codepoint
  * (document fingerprinting for the text-pipeline surface; the reference's
  * nearest analog is its content-hash intent in dedup-ish id handling).
  *
  * A native Catalyst `Expression` with codegen rather than a Scala UDF: the
  * generated code is a single static call on the raw `UTF8String`, so it
  * stays inside whole-stage codegen with no serialization, boxing, or
  * null-check overhead in the hot loop. Semantically identical to the
  * higher-order-function formulation in
  * [[graft.queries.PipelineQueries.fingerprints]] (tested against it).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 2147483647L // 2^31 - 1
  final val Base = 31L

  /** Static helper invoked from both eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    var first = true
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = if (first) { first = false; cp.toLong }
            else (acc * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
