package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Σ weights(b) over an `array<long>` of bucket ids, as ONE compiled
  * per-row kernel — the margin fold of the hashed linear classifier
  * ([[graft.llm.Importance.trainLogisticHashed]] / `logitCol`), replacing
  * the HOF `aggregate(bks, 0L, (acc, b) => acc + element_at(w, b+1))`
  * spelling, which is kept as the value-identity parity witness
  * (ImportanceSpec).
  *
  * Why this exists: HOF lambdas (`ArrayAggregate`) never enter
  * whole-stage codegen — each element evaluates through interpreted
  * `Expression.eval` virtual dispatch. That is tolerable in a fresh JVM,
  * but in a long-running one (the 169-query full bench) those shared
  * interpreter call sites go megamorphic from every other query's
  * expression classes and the fold runs ~10× slower — measured: q115
  * 2.09 s isolated vs 20-21 s after 25 unrelated heavy queries in the
  * same JVM, with jstack pinning the entire gap inside
  * `ArrayAggregate.eval`. A compiled kernel is a fresh monomorphic loop,
  * immune to interpreter profile pollution — and faster everywhere else
  * too. The weight table rides along as a codegen reference object (it
  * is the MODEL — ≤ buckets longs), so per-iteration weight updates just
  * build a new literal-free plan.
  *
  * Weights array must cover every bucket id; ids are trusted in-range
  * (they are `pmod(hash, buckets)` by construction). */
case class BucketWeightSum(child: Expression, weights: Array[Long])
    extends UnaryExpression {
  require(weights.nonEmpty, "bucket_weight_sum needs a non-empty model")

  override def dataType: DataType = LongType

  override def nullSafeEval(arr: Any): Any =
    BucketWeightSum.compute(arr.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bucketWeights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BucketWeightSum.compute($c, $wRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BucketWeightSum = copy(child = newChild)
}

object BucketWeightSum {
  def compute(arr: ArrayData, w: Array[Long]): Long = {
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += w(arr.getLong(i).toInt); i += 1 }
    s
  }
}
