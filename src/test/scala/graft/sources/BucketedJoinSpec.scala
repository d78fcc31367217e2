package graft.sources

import graft.SparkSpec

/** Co-located joins via bucketing (the 100 TB fact⋈fact strategy when
  * neither side broadcasts): both tables written `bucketBy` the join
  * key → the join consumes the bucketing as its required distribution
  * and plans NO shuffle exchange on either side.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val li = (1 to 2000).map(i => (i.toLong % 400 + 1, i.toDouble)).toDF("orderkey", "amount")
    val od = (1 to 400).map(i => (i.toLong, s"prio${i % 3}")).toDF("orderkey", "priority")

    li.write.mode("overwrite").bucketBy(8, "orderkey").sortBy("orderkey")
      .saveAsTable("li_bucketed")
    od.write.mode("overwrite").bucketBy(8, "orderkey").sortBy("orderkey")
      .saveAsTable("od_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("li_bucketed")
        .join(spark.table("od_bucketed"), "orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + plan.take(1200))
      assert(joined.count() === 2000)

      // contrast: same data unbucketed DOES shuffle both sides
      val plain = li.join(od, "orderkey")
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS od_bucketed")
    }
  }
}
