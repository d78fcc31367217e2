package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-probe row counter: runs named declared queries against an
  * arbitrary corpus dir and prints `name,rows,seconds` — the
  * invariant side of a scale probe (e.g. the sf1 decade: q28's pair
  * count must be exactly K× the sf0.1 count under ScaleUp's
  * replica-disjoint corpus; q324/q339's hash-capped pools must stay
  * bounded regardless of corpus size). Timing here is count()-pruned
  * and NOT comparable to Bench rows — use BENCH_ONLY for wall times.
  *
  *   sbt "runMain graft.tools.ProbeCount /tmp/graft-sf1 q28_minhash_pairs q324_rouge_pairs"
  */
object ProbeCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val n = qs(name)(spark, sfDir).count()
        println(f"[probe] $name,$n,${(System.nanoTime() - t0) / 1e9}%.1f")
      } catch { case e: Throwable =>
        println(s"[probe] $name,FAILED,${e.getMessage}")
      } finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
