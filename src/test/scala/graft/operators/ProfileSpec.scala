package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("profile: one row per column with exact counts/nulls/min/max/mean") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(10L)),
      (Some(2.0), None),
      (Some(3.0), Some(30L)),
      (None, Some(20L))
    ).toDF("x", "y")
    val p = Profile.profile(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(p("x") === ((3L, 1L, 1.0, 3.0, 2.0)))
    assert(p("y") === ((3L, 1L, 10.0, 30.0, 20.0)))
  }

  test("ndv estimate lands within the configured relative error") {
    import spark.implicits._
    val df = (1 to 20000).map(i => i % 5000).toDF("v")
    val ndv = Profile.profile(df, Seq("v"), rsd = 0.02)
      .select($"ndv").head.getLong(0)
    assert(math.abs(ndv - 5000.0) / 5000.0 < 0.06, s"ndv=$ndv")
  }

  test("all columns profile in a single aggregate: one scan, no Expand") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toDouble, i * 2.0, i * 3.0)).toDF("a", "b", "c")
    val plan = Profile.profile(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "profiling must not compile to an Expand (the exact-distinct pathology):\n" +
        plan.take(800))
    // one aggregate pair (partial+final), not one per column
    assert("HashAggregate".r.findAllIn(plan).length <= 2, plan.take(800))
  }
}
