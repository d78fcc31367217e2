package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("each check type counts its violations") {
    val df = Seq(
      (Some(1L), 10.0, "A"),
      (Some(2L), -5.0, "B"),        // range violation
      (Some(2L), 10.0, "A"),        // duplicate key
      (None, 10.0, "Z")             // null key + bad status
    ).toDF("k", "v", "st")
    val ref = Seq(1L, 2L).toDF("rk")
    val report = Expectations.run(df, Seq(
      Expectations.NotNull("k"),
      Expectations.InRange("v", 0.0, 100.0),
      Expectations.InSet("st", Seq("A", "B")),
      Expectations.Unique(Seq("k")),
      Expectations.ForeignKey("k", ref, "rk", "ref"),
      Expectations.Predicate("v_cap", col("v") < 10.0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap

    assert(report("not_null(k)") === (1L, false))
    assert(report("in_range(v,0.0,100.0)") === (1L, false))
    assert(report("in_set(st)") === (1L, false))
    // 4 rows, 3 distinct keys — the struct() wrap makes the null key a
    // countable group (struct(null) is a non-null value), so nulls
    // dedup like any other key: 4 − |{1, 2, null}| = 1
    assert(report("unique(k)")._1 === 1L)
    assert(report("foreign_key(k->ref.rk)") === (0L, true))
    assert(report("predicate(v_cap)") === (3L, false))
  }

  test("all-green report passes") {
    val df = Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v")
    val rep = Expectations.run(df, Seq(
      Expectations.NotNull("k"),
      Expectations.Unique(Seq("k")),
      Expectations.InRange("v", 0.0, 10.0)))
    assert(rep.filter(!col("pass")).count() === 0)
  }
}
