package graft.plans

import graft.SparkSpec
import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** Custom as-of operator (logical node + strategy + sorted-merge
  * exec): row-for-row parity with the composed union+window form, the
  * physical plan shape, and the merge edge cases.
  */
class AsofJoinNativeSpec extends SparkSpec {

  test("parity with the composed form on the events corpus") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val left = ev.select($"event_id", $"user_id", $"ts")
    val right = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
      // the composed form requires (key, ts)-unique right rows
      .groupBy($"user_id", $"ts").agg(max($"value").as("value"))
    val native = AsofJoinNative.asofJoin(left, right, "user_id", "ts", "ts", Seq("value"))
      .select($"event_id", $"__asof_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val composed = AsofJoin.asofJoin(left, right, "user_id", "ts", "ts", Seq("value"))
      .select($"event_id", $"__asof_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(native.size == composed.size && native == composed,
      s"native and composed as-of joins diverge on ${
        native.keySet.union(composed.keySet).find(k => native.get(k) != composed.get(k))}")
  }

  test("inclusive at equal ts, latest-preceding, and no-match → null") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L),
      (4L, "u2", 100L), (5L, "u3", 50L)
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("u1", 10L, "v@10"), ("u1", 15L, "v@15"), ("u2", 99L, (null: String))
    ).toDF("k", "rt", "payload")
    val out = AsofJoinNative.asofJoin(left, right, "k", "t", "rt", Seq("rt", "payload"))
      .collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        Option(r.getString(4)))).toMap
    assert(out(1L) == (Some(10L), Some("v@10"))) // inclusive
    assert(out(2L) == (Some(15L), Some("v@15"))) // latest preceding
    assert(out(3L) == (None, None))              // nothing at or before
    assert(out(4L) == (Some(99L), None))         // matched row, null payload
    assert(out(5L) == (None, None))              // key absent on the right
  }

  test("plans as AsofJoinExec: merge, not union+window, one exchange per side") {
    import spark.implicits._
    val left = (1 to 200).map(i => (i.toLong, s"u${i % 7}", i.toLong)).toDF("id", "k", "t")
    val right = (1 to 50).map(i => (s"u${i % 7}", i.toLong * 3, i.toDouble)).toDF("k", "rt", "v")
    val q = AsofJoinNative.asofJoin(left, right, "k", "t", "rt", Seq("v"))
    assert(q.count() == 200)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(800))
    assert(!plan.contains("Window"), "the native operator must not plan a window")
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2, plan)
  }

  test("result is layout-independent") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong, (i % 5).toLong, i.toLong)).toDF("id", "k", "t")
    val right = (1 to 30).map(i => ((i % 5).toLong, i.toLong * 2, i.toDouble)).toDF("k", "rt", "v")
    def run(lp: Int, rp: Int) =
      AsofJoinNative.asofJoin(left.repartition(lp), right.repartition(rp),
          "k", "t", "rt", Seq("v"))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(run(1, 1) == run(7, 3))
  }

  test("shared-attribute sides are rejected, not silently wrong") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      AsofJoinNative.asofJoin(df, df, "k", "t", "t", Seq("t"))
    }
  }
}
