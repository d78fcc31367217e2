package graft

import org.apache.spark.sql.SparkSession

/** Local plan-inspection tool: print the formatted physical plan of
  * one declared query and time its noop-sink execution —
  * `sbt "runMain graft.Explain <name> <sfDir>"`. The iteration loop
  * behind every plan-audit note in ARCHITECTURE.md.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"[explain] $name noop-sink elapsed ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
