package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime (bloom-filter) join pruning: when one join side carries a
  * selective filter, Spark injects a bloom filter built from it into
  * the OTHER side's scan — at 100 TB this is the difference between
  * scanning the whole fact table and skipping everything the dim
  * filter already excluded. Thresholds are lowered here to trigger on
  * spec-sized data; the assertion is that the injection machinery
  * fires at all, so a config regression can't silently disable it.
  */
class RuntimeBloomFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter into the fact scan") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // parquet-backed so the filter has a scan to push into
      val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
      (0 until 100000).map(i => (i.toLong % 1000, s"p$i")).toDF("k", "payload")
        .write.mode("overwrite").parquet(s"$dir/fact")
      (0L until 1000L).map(k => (k, k % 7)).toDF("k", "grp")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"grp" === 3)
      val joined = fact.join(dim, "k")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter"),
        "runtime bloom filter not injected:\n" + plan.take(1500))
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
