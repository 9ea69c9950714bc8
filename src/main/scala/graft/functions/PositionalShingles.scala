package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** POSITION-ORDERED 64-bit word n-gram shingle hashes from a token array,
  * one compiled O(tokens) pass: element i is the hash of the gram starting
  * at token i (0-based), duplicates preserved.
  *
  * Same token hash (XXH64 over UTF-8 bytes, seed 42) and gram chaining
  * (XXH64.hashLong fold, exactly Spark's multi-arg `xxhash64`) as
  * [[HashedShingles]] — `sort_array(array_distinct(·))` of this output
  * equals `HashedShingles` bit-for-bit (asserted in ExpressionsSpec).
  * Where [[HashedShingles]] feeds SET algebra (Jaccard, containment),
  * this feeds POSITIONAL algebra: `posexplode` yields (position, gram)
  * postings for duplicate-substring-span detection
  * ([[graft.llm.Dedup.duplicateSpans]]), where the start offset of each
  * occurrence is the payload and collapsing repeats would be wrong.
  */
case class PositionalShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(toks: Any): Any =
    PositionalShingles.compute(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PositionalShingles.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): PositionalShingles = copy(child = newChild)
}

object PositionalShingles {
  private final val Seed = 42L // Spark's xxhash64 default seed

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      // null element: hash stays at the seed — Spark's xxhash64 null-skip
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
    new GenericArrayData(g)
  }
}
