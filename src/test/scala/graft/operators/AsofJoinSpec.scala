package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  test("asof semantics: latest <= ts per key, inclusive, null-safe") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L),
      (4L, "u2", 100L), (5L, "u3", 50L)
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("u1", 10L, "v@10"),        // equal ts → inclusive match for event 1
      ("u1", 15L, "v@15"),
      ("u2", 99L, (null: String)) // real row with null payload
    ).toDF("k", "rt", "payload")

    val out = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("payload"))
      .select($"event_id", $"__asof_payload")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(out(1L) === Some("v@10"))    // inclusive at equal ts
    assert(out(2L) === Some("v@15"))    // latest preceding
    assert(out(3L) === None)            // nothing at or before t=5
    assert(out(4L) === None)            // matched row, null payload — but
                                        // distinguished below via struct…
    assert(out(5L) === None)            // key with no right rows
  }

  test("matched-row-with-null-payload is distinguishable when ts is in the payload") {
    import spark.implicits._
    val left = Seq((1L, "u2", 100L)).toDF("event_id", "k", "t")
    val right = Seq(("u2", 99L, (null: String))).toDF("k", "rt", "payload")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("rt", "payload"))
      .select($"event_id", $"__asof_rt", $"__asof_payload").head()
    assert(out.getLong(1) === 99L)      // the match IS visible via its ts
    assert(out.isNullAt(2))             // while its payload is null
  }

  test("one shuffle: single Exchange in the physical plan") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong, s"u${i % 5}", i.toLong)).toDF("event_id", "k", "t")
    val right = (1 to 20).map(i => (s"u${i % 5}", i.toLong * 3, i.toDouble)).toDF("k", "rt", "v")
    val q = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("v"))
    assert(q.count() === 100)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1, plan)
  }
}
