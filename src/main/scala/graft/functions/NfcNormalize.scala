package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * compiled expression — the step-0 text-hygiene pass of a web
  * pipeline: crawls deliver the SAME text in composed ("é") and
  * decomposed ("e" + U+0301) spellings, and every downstream
  * exact-dedup fingerprint, shingle hash and tokenizer treats them as
  * different bytes unless normalization runs first. Delegates to
  * `java.text.Normalizer` (the JDK's ICU-derived tables); DuckDB's
  * `nfc_normalize` replays it exactly, so the oracle can check the
  * normalized text byte-for-byte. Null → null. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC-checking is much cheaper than normalizing and the
    // overwhelming majority of web text is already composed
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}
