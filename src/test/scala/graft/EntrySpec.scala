package graft

class EntrySpec extends SparkSpec {

  test("driver t1 smoke: entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("driver contract: every oracleSql key is a declared query; names unique") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert(QueryDef.all.map(_.name).distinct.size === QueryDef.all.size)
    assert(qs.size === QueryDef.all.size)
  }

  test("AQE coalesces over-provisioned shuffle partitions") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "64")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    import org.apache.spark.sql.functions._
    val df = Tables.lineitem(s2, "/root/testdata/sf0.001")
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"), plan.take(800))
  }
}
