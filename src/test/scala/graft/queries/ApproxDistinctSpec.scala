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
}
