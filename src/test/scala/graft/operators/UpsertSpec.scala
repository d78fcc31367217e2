package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {

  test("matched rows take the update, unmatched insert, rest pass through") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val updates = Seq((2L, "B2", 99.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val got = Upsert.upsert(target, updates, "k")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got === Map(
      1L -> (("a", 10.0)),   // untouched
      2L -> (("B2", 99.0)),  // updated
      3L -> (("c", 30.0)),   // untouched
      4L -> (("d", 40.0)))) // inserted
  }

  test("whole-row precedence: an update's null overwrites the target value") {
    import spark.implicits._
    val target = Seq((1L, "keep")).toDF("k", "name")
    val updates = Seq((1L, null: String)).toDF("k", "name")
    val got = Upsert.upsert(target, updates, "k").collect()
    assert(got.length === 1 && got.head.isNullAt(1),
      "MERGE matched-row semantics take the update row wholesale")
  }

  test("duplicate keys in the delta fail fast (MERGE cardinality contract)") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "name")
    val updates = Seq((1L, "x"), (1L, "y")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsert(target, updates, "k")
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("schema mismatch fails fast") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "name")
    val updates = Seq((1L, 2.0)).toDF("k", "other")
    intercept[IllegalArgumentException] {
      Upsert.upsert(target, updates, "k")
    }
  }

  test("a NULL merge key in the delta fails fast, never a silent null insert") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val updates = Seq((java.lang.Long.valueOf(2L), "b"), (null.asInstanceOf[java.lang.Long], "c"))
      .toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsert(target, updates, "k")
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("delta-sized updates broadcast: the target side never shuffles") {
    import spark.implicits._
    val target = (1L to 50000L).map(i => (i, s"n$i", i * 1.0)).toDF("k", "name", "v")
    val updates = Seq((5L, "x", 0.0), (50001L, "y", 1.0)).toDF("k", "name", "v")
    val merged = Upsert.upsert(target, updates, "k")
    assert(merged.count() === 50001L)
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "small update side should broadcast under AQE:\n" + plan.take(1200))
  }
}
