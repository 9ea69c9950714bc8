package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BottomKAgg, CosineSim, CountMinAgg, HyperLogLogAgg, IntDot, MapCountAgg, Md5Prefix60, MisraGriesAgg, MultiContains, PolyHash}

/** Registration of the engine's native Catalyst expressions.
  *
  * Two entry points:
  *  - [[GraftExtensions]] for `spark.sql.extensions` (cluster deploys);
  *  - [[GraftFunctions.register]] for an already-built session (the
  *    driver-contract mains, tests).
  *
  * After registration the functions are usable from SQL and `expr(...)`:
  * `poly_hash(text)`, `cosine_sim(vec_a, vec_b)`, `md5_prefix60(text)`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.AnnJoinRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftFunctions {
  type Descriptor = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)

  val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))),
    (FunctionIdentifier("map_count"),
      new ExpressionInfo(classOf[MapCountAgg].getName, "map_count"),
      (children: Seq[Expression]) => MapCountAgg(children.head)),
    (FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (children: Seq[Expression]) => Md5Prefix60(children.head)),
    (FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (children: Seq[Expression]) => MisraGriesAgg(children.head,
        children(1).eval().asInstanceOf[Number].intValue)),
    (FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[IntDot].getName, "int_dot"),
      (children: Seq[Expression]) => IntDot(children(0), children(1))),
    (FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "count_min"),
      (children: Seq[Expression]) => CountMinAgg(children.head,
        children(1).eval().asInstanceOf[Number].intValue,
        children(2).eval().asInstanceOf[Number].intValue,
        children(3).eval().asInstanceOf[Number].intValue)),
    (FunctionIdentifier("hll_registers"),
      new ExpressionInfo(classOf[HyperLogLogAgg].getName, "hll_registers"),
      (children: Seq[Expression]) => HyperLogLogAgg(children.head,
        children(1).eval().asInstanceOf[Number].intValue,
        children(2).eval().asInstanceOf[Number].intValue)),
    (FunctionIdentifier("bottom_k"),
      new ExpressionInfo(classOf[BottomKAgg].getName, "bottom_k"),
      (children: Seq[Expression]) => BottomKAgg(children(0), children(1),
        children(2),
        children(3).eval().asInstanceOf[Number].intValue)),
    // multi_contains(text, term1, term2, ...) — dictionary terms must be
    // foldable string literals (the automaton compiles once per plan).
    (FunctionIdentifier("multi_contains"),
      new ExpressionInfo(classOf[MultiContains].getName, "multi_contains"),
      (children: Seq[Expression]) => MultiContains(children.head,
        children.tail.map(_.eval().toString))))

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
