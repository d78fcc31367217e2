package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class WarehouseSpec extends SparkSpec {

  test("DDL surface (S12): CREATE DATABASE / USE / SHOW TABLES / DROP") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    spark.sql("USE graft_db")
    try {
      Seq((1, "a")).toDF("id", "v").write.mode("overwrite").saveAsTable("t1")
      val tables = spark.sql("SHOW TABLES").collect().map(_.getString(1))
      assert(tables.contains("t1"))
      assert(spark.table("t1").count() === 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS t1")
      spark.sql("USE default")
      spark.sql("DROP DATABASE IF EXISTS graft_db")
    }
  }

  test("partitioned sink + partition-pruned scan: only matching partition files read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val df = (1 to 3000).map(i =>
      (i.toLong, Seq("click", "view", "error")(i % 3), i.toDouble)).toDF("id", "etype", "v")
    df.write.partitionBy("etype").parquet(dir)

    val q = spark.read.parquet(dir).filter($"etype" === "click")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(etype"), plan.take(600))
    assert(q.count() === 1000)
    // physically: only the matching partition directory is scanned
    val scanned = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("etype=view") || scanned.contains("etype=click"))
    val files = q.select(org.apache.spark.sql.functions.input_file_name()).distinct().collect()
    assert(files.forall(_.getString(0).contains("etype=click")))
  }
}
