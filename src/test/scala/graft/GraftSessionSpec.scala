package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The production session recipe actually applies what it promises.
  *
  * Suites share one JVM (Test/fork) and one lazy SparkSession
  * (SparkSpec.session), and `getOrCreate` on an existing session does
  * NOT re-apply builder confs — so the conf assertions only run when
  * this suite happens to create the first session of the JVM, and the
  * session is never stopped here (stopping the shared one would poison
  * every later suite). Registration assertions hold either way —
  * `GraftSession.build` registers on whatever session it returns. */
class GraftSessionSpec extends AnyFunSuite {

  test("build: confs (fresh session only), functions, rules, idempotency") {
    val fresh = SparkSession.getActiveSession.isEmpty &&
      SparkSession.getDefaultSession.isEmpty
    val spark = GraftSession.build(
      SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false"))
    if (fresh) {
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    }
    // native function registry reachable from SQL
    assert(spark.sql("SELECT poly_hash('abc')").head().getLong(0) != 0L)
    // rules + strategy registered
    assert(spark.experimental.extraOptimizations
      .contains(graft.plans.TopKRewrite))
    assert(spark.experimental.extraOptimizations
      .contains(graft.plans.AnnJoinRewrite))
    assert(spark.experimental.extraStrategies
      .contains(graft.plans.TopKPerKeyStrategy))
    // calling build again is a no-op, not a duplicate registration
    GraftSession.build(SparkSession.builder().master("local[2]"))
    assert(spark.experimental.extraOptimizations
      .count(_ == graft.plans.TopKRewrite) == 1)
  }
}
