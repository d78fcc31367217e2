package graft

import org.apache.spark.sql.functions._

class GraftFacadeSpec extends SparkSpec {

  test("install is idempotent and wires functions + optimizer rules") {
    Graft.install(spark)
    Graft.install(spark)
    assert(spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))")
      .head().getDouble(0) === 1.0)
    assert(spark.sql(
      "SELECT sorted_intersect_count(array('a','b'), array('b','c'))")
      .head().getInt(0) === 1)
    assert(spark.experimental.extraOptimizations
      .count(_ == plans.PushPredicateThroughExplode) === 1)
    assert(spark.experimental.extraStrategies
      .count(_ == plans.AsofJoinNative.AsofJoinStrategy) === 1)
    // sketches reachable from pure SQL
    val regs = spark.sql(
      "SELECT hll_sketch(k) FROM (SELECT explode(sequence(1, 500)) AS k)")
      .head().getSeq[Int](0)
    assert(regs.length === functions.HyperLogLog.M && regs.exists(_ > 0))
    val cms = spark.sql(
      "SELECT cms_sketch(CAST(k AS STRING)) FROM (SELECT explode(sequence(1, 50)) AS k)")
      .head().getSeq[Long](0)
    assert(cms.sum === 50L * functions.CountMinSketch.Depth)
  }
}
