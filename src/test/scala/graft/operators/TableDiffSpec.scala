package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added / removed / changed / unchanged") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val neu = Seq((2L, "b", 20.0), (3L, "c", 99.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val d = TableDiff.diff(old, neu, Seq("k"), Seq("s", "v"))
      .select($"k", $"change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("null column values are compared null-safely, not as changes") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "s")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val d = TableDiff.diff(old, neu, Seq("k"), Seq("s"))
      .select($"k", $"change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("diff recovers the delta applied by upsert (round trip)") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val delta = Seq((2L, 99.0), (9L, 90.0)).toDF("k", "v")  // update + insert
    val merged = Upsert.upsert(base, delta, "k")
    val d = TableDiff.diff(base, merged, Seq("k"), Seq("v"))
    val byType = d.groupBy($"change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType === Map("unchanged" -> 2L, "changed" -> 1L, "added" -> 1L))
    val changed = d.filter($"change_type" =!= "unchanged")
      .select($"k", $"new_v").orderBy($"k")
      .as[(Long, Double)].collect().toSeq
    assert(changed === Seq((2L, 99.0), (9L, 90.0)))
  }
}
