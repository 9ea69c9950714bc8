package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The decoded filesystem path of a file URI, as a compiled
  * expression: Spark's scan-side file identities
  * (`_metadata.file_path`, `input_file_name()`) are URL-ENCODED URI
  * strings, while the snapshot manifest records on-disk (decoded)
  * relative paths — any row-level join between the two (the
  * merge-on-read positional-delete anti-join) must decode first or a
  * partition directory with an escaped value (space, %, =, #) silently
  * mismatches — the same skew
  * [[graft.io.SnapshotTable]]'s driver-side `decodeScanPath` guards
  * against, here as a codegen-friendly `Column` so the hot path stays
  * inside whole-stage codegen instead of a Scala UDF. Non-URI input
  * passes through unchanged; null → null. */
case class UriPath(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    UriPath.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UriPath.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): UriPath = copy(child = newChild)
}

object UriPath {
  def compute(s: UTF8String): UTF8String =
    UTF8String.fromString(decode(s.toString))

  /** `new URI(s).getPath` with pass-through on anything unparseable —
    * byte-compatible with the driver-side decodeScanPath. */
  def decode(s: String): String =
    try {
      val p = new java.net.URI(s).getPath
      if (p == null) s else p
    } catch { case _: java.net.URISyntaxException => s }
}
