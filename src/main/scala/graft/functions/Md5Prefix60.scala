package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The portable-hash leaf as a native codegen expression: the top 60 bits
  * of md5(input) as a non-negative long — value-identical to the SQL
  * spelling `conv(substring(md5(x), 1, 15), 16, 10)` (the first 15 hex
  * characters of a digest are its first 8 bytes, big-endian, shifted
  * right by one nibble), but WITHOUT materializing the 32-char hex
  * string, substringing it, and re-parsing base-16 per row. The md5 work
  * itself is unchanged (same DigestUtils call Spark's own `md5` uses);
  * what this removes is the string round-trip on the hot path of every
  * portable-hash LSH operator (shingle hashing runs once per token per
  * document across the whole corpus).
  *
  * Oracle spelling is unaffected — DuckDB keeps
  * `('0x' || substr(md5(...), 1, 15))::BIGINT`; this expression produces
  * the same value by construction (property-tested against the conv
  * formulation in ExpressionsSpec).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  /** Static helper shared by eval and generated code. */
  def compute(s: UTF8String): Long = {
    val b = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    val hi =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    hi >>> 4 // drop the low nibble of byte 7: exactly the 15-hex-char value
  }
}
