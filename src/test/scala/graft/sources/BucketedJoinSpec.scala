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

  test("q57 artifact: bucketed copies join shuffle-free with oracle-equal values") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit}
    val d = "/root/testdata/sf0.001"
    val buckets = 8
    val li = BucketedTables.ensure(spark,
      graft.Tables.lineitem(spark, d).select($"l_orderkey", $"l_extendedprice", $"l_discount"),
      "graft_li_bucketed",
      graft.ArtifactCache.path("buck-li",
        java.nio.file.Paths.get(d, "lineitem.parquet"), s"b$buckets"),
      "l_orderkey", buckets)
    val od = BucketedTables.ensure(spark,
      graft.Tables.orders(spark, d).select($"o_orderkey", $"o_orderpriority"),
      "graft_od_bucketed",
      graft.ArtifactCache.path("buck-od",
        java.nio.file.Paths.get(d, "orders.parquet"), s"b$buckets"),
      "o_orderkey", buckets)

    // second ensure over the already-built artifact: same table, no rewrite
    assert(BucketedTables.ensure(spark,
      graft.Tables.orders(spark, d).select($"o_orderkey", $"o_orderpriority"),
      "graft_od_bucketed",
      graft.ArtifactCache.path("buck-od",
        java.nio.file.Paths.get(d, "orders.parquet"), s"b$buckets"),
      "o_orderkey", buckets) === od)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(li).join(spark.table(od), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed artifact join must not shuffle:\n" + plan.take(1200))

      // values equal the plain (shuffling) join — the artifact changes
      // the plan, never the answer
      val got = joined.groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val want = graft.Tables.lineitem(spark, d)
        .join(graft.Tables.orders(spark, d), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
