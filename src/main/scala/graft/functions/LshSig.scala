package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH signature of a float-array embedding as ONE
  * codegen'd expression: for each of `planes` hyperplanes, the sign of a
  * fixed-point projection (`round(x_d·1000) · w(p,d)` summed as longs)
  * contributes one signature bit. Integer arithmetic end-to-end, so the
  * signature is bit-stable across runs, partitions and retries.
  *
  * Plane weights come from a per-JVM memoized table derived from a pure
  * string hash of "p:d" — engine-internal (this expression backs the
  * opt-in [[graft.plans.AnnJoinRewrite]] bucket join, which never runs in
  * the oracle gate; the oracle-portable signature path lives in
  * [[graft.llm.Similarity.lshSignatures]]).
  *
  * Cosine-similar vectors agree on a hyperplane sign with probability
  * 1 − θ/π, so sharing all `planes` bits concentrates candidates with
  * high cosine — the precondition the rewrite relies on.
  */
case class LshSig(child: Expression, planes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    LshSig.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshSig.compute($c, $planes)")

  override protected def withNewChildInternal(newChild: Expression): LshSig =
    copy(child = newChild)
}

object LshSig {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Int]]()

  /** Weight table for (planes, dims), memoized per JVM; entry (p,d) is
    * weights(p*dims + d) ∈ [-500, 499]. MurmurHash3 of "p:d" is a pure
    * function — every executor derives the identical table. */
  private def weights(planes: Int, dims: Int): Array[Int] =
    cache.computeIfAbsent((planes, dims), { case (pl, dm) =>
      val w = new Array[Int](pl * dm)
      var p = 0
      while (p < pl) {
        var d = 0
        while (d < dm) {
          val h = scala.util.hashing.MurmurHash3.stringHash(s"$p:$d")
          w(p * dm + d) = math.floorMod(h, 1000) - 500
          d += 1
        }
        p += 1
      }
      w
    })

  /** Static helper shared by eval and generated code. */
  def compute(a: ArrayData, planes: Int): Long = {
    val dims = a.numElements()
    val w = weights(planes, dims)
    // fixed-point embedding, computed once and reused for every plane
    val xi = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      xi(d) = math.round(a.getFloat(d).toDouble * 1000)
      d += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      var proj = 0L
      var i = 0
      val off = p * dims
      while (i < dims) { proj += xi(i) * w(off + i); i += 1 }
      if (proj > 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}
