package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSim, LshSig}

/** OPT-IN approximate-join rewrite: an inner join whose condition demands
  * `cosine_sim(a, b) >= t` with no equi keys plans as a nested-loop /
  * cartesian product — O(|L|·|R|) comparisons. With this rule enabled, the
  * join condition gains a bucket-equality conjunct
  * `LshSig(a, planes) = LshSig(b, planes)`, which lets the planner pick a
  * hash/sort-merge EQUI join on the signature: comparisons collapse to
  * within-bucket pairs, the standard LSH candidate-join shape.
  *
  * THIS CHANGES RESULTS: pairs whose signatures differ are never compared
  * (output is a high-recall SUBSET of the exact join — every emitted row
  * still satisfies the original predicate, which stays in the condition).
  * It is therefore **disabled by default** and NEVER active in the
  * correctness gate; enable per session with
  * `spark.conf.set("spark.graft.ann.bucketJoin", "true")` (plane count via
  * `spark.graft.ann.bucketJoin.planes`, default 8 — recall degrades as
  * planes grow; 8 planes ≈ 0.97^8 ≈ 0.78 per-plane-agreement recall at
  * cosine 0.9). The exact formulations (q47) and the explicit LSH/IVF
  * operators ([[graft.llm.Similarity]]) are unaffected.
  */
object AnnJoinRewrite extends Rule[LogicalPlan] {

  private val enabledKey = "spark.graft.ann.bucketJoin"
  private val planesKey = "spark.graft.ann.bucketJoin.planes"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "false").toBoolean) return plan
    val planes = conf.getConfString(planesKey, "8").toInt
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !containsLshSig(cond) && hasCrossSideCosineBound(j, cond) =>
        cosineArgs(j, cond) match {
          case Some((a, b)) =>
            val bucketEq = EqualTo(LshSig(a, planes), LshSig(b, planes))
            Join(left, right, Inner, Some(And(bucketEq, cond)), hint)
          case None => j
        }
    }
  }

  private def containsLshSig(e: Expression): Boolean =
    e.exists(_.isInstanceOf[LshSig])

  /** The condition demands a lower-bounded cosine between one column from
    * each side, and no conjunct is already an equi-join key (if one is,
    * the join is hash-joinable without us). */
  private def hasCrossSideCosineBound(j: Join, cond: Expression): Boolean =
    cosineArgs(j, cond).isDefined && !splitConjuncts(cond).exists {
      case EqualTo(l, r) =>
        sidesSplit(j, l, r) || sidesSplit(j, r, l)
      case _ => false
    }

  private def cosineArgs(j: Join, cond: Expression): Option[(Expression, Expression)] =
    splitConjuncts(cond).collectFirst {
      case GreaterThanOrEqual(c: CosineSim, Literal(_, _)) if split(j, c) => (c.left, c.right)
      case GreaterThan(c: CosineSim, Literal(_, _)) if split(j, c) => (c.left, c.right)
      case LessThanOrEqual(Literal(_, _), c: CosineSim) if split(j, c) => (c.left, c.right)
      case LessThan(Literal(_, _), c: CosineSim) if split(j, c) => (c.left, c.right)
    }

  /** cosine's two inputs come one from each join side. */
  private def split(j: Join, c: CosineSim): Boolean =
    sidesSplit(j, c.left, c.right) || sidesSplit(j, c.right, c.left)

  private def sidesSplit(j: Join, l: Expression, r: Expression): Boolean =
    l.references.nonEmpty && r.references.nonEmpty &&
      l.references.subsetOf(j.left.outputSet) &&
      r.references.subsetOf(j.right.outputSet)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
