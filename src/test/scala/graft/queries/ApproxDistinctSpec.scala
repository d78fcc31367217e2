package graft.queries

import graft.SparkSpec

class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct within 3% (rsd=0.01 sketch) of exact on the test corpus") {
    val row = ScaleQueries.defs.find(_.name == "q35_approx_distinct").get
      .fn(spark, "/root/testdata/sf0.001").head()
    val (exactO, approxO) = (row.getLong(0), row.getLong(1))
    val (exactP, approxP) = (row.getLong(2), row.getLong(3))
    assert(math.abs(approxO - exactO).toDouble / exactO < 0.03, s"$approxO vs $exactO")
    assert(math.abs(approxP - exactP).toDouble / exactP < 0.03, s"$approxP vs $exactP")
  }

  test("percentile_approx within 1% of exact median per group") {
    val rows = ScaleQueries.defs.find(_.name == "q43_percentile_sketch").get
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getDouble(1); val approx = r.getDouble(2)
      assert(math.abs(approx - exact) / exact < 0.01, s"${r.getString(0)}: $approx vs $exact")
    }
  }
}
