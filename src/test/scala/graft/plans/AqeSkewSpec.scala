package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime skew handling — the AQE half of the skew story (the static
  * half, key salting, is oracle-checked as q36): a join whose shuffle
  * has one dominant key gets its oversized partitions SPLIT at runtime
  * by adaptive execution, so one hot key cannot serialize a
  * 1000-executor stage behind a single straggler task.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 95% of fact rows share one key; dim is uniform
      val fact = (0 until 60000)
        .map(i => (if (i % 20 != 0) 7L else (i % 100).toLong, s"payload_$i"))
        .toDF("k", "payload")
      val dim = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "attr")
      val joined = fact.join(dim, "k")
      // collect() executes THIS Dataset's queryExecution (count() would
      // plan a separate aggregate query and leave this plan un-run, so
      // the AQE final plan would never materialize here)
      assert(joined.collect().length === 60000)

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE did not mark the skewed join:\n" + finalPlan.take(1500))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
