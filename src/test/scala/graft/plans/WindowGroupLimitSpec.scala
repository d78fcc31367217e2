package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-n (the q05 shape: row_number ≤ k) must compile to a
  * WindowGroupLimit — Spark's rank-limit pushdown keeps only k rows
  * per key in each map task BEFORE the window shuffle, so a top-5 over
  * a billion-row group ships 5·tasks rows, not the group. If a Spark
  * upgrade or a query rewrite silently loses this (e.g. by filtering
  * on a derived column the optimizer can't see through), top-n costs
  * return to full-sort — this spec pins the plan.
  */
class WindowGroupLimitSpec extends SparkSpec {

  test("row_number filter compiles to WindowGroupLimit (map-side top-k)") {
    import spark.implicits._
    val df = (0 until 10000).map(i => (i % 50, i, i * 1.5)).toDF("k", "id", "v")
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id")
    val topn = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
    assert(topn.count() === 250)
    val plan = topn.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank-limit pushdown missing — top-n pays a full window sort:\n" + plan.take(1200))
  }
}
