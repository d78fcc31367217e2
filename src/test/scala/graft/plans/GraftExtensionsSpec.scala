package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The `spark.sql.extensions` injection path (GraftExtensions) must
  * carry the FULL rule set — GraftOptimizations.rules is the single
  * source of truth behind both it and Graft.install, and this spec
  * drives a real extensions-built session through two of the rules
  * WITHOUT any install() call, so a packaging regression (one rule
  * missing from the extensions class) fails loudly.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions-built session runs the optimizer rules with no install() call") {
    val fixture = spark              // force the shared session FIRST —
    // otherwise the getOrCreate below would CREATE the fixture and the
    // identity assertion compares a session to itself
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      assert(s ne fixture, "getOrCreate must have built a NEW session here")
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("gext").toString
      Seq(("abc", "abd"), ("a", "abcdef")).toDF("a", "b")
        .write.mode("overwrite").parquet(tmp)
      val df = s.read.parquet(tmp)
      // InferLevenshteinBand fires through the extensions path
      val q1 = df.filter(levenshtein(col("a"), col("b")) <= 1)
      assert(q1.queryExecution.optimizedPlan.toString.contains("abs("),
        "levenshtein band missing — extensions path lost a rule")
      assert(q1.count() === 1L)
      // InferJaccardSizeBand + Hoist fire on a join through the same path
      val tok = "array_distinct(filter(split(trim(%s), '\\\\s+'), x -> x <> ''))"
      val l = df.select(col("a").as("ta"))
      val r = df.select(col("a").as("tb"))
      val j = l.crossJoin(r).filter(expr(
        s"cast(size(array_intersect(${tok.format("ta")}, ${tok.format("tb")})) as double)" +
          s" / size(array_union(${tok.format("ta")}, ${tok.format("tb")})) >= 0.5"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("(0.5 * "), "jaccard band missing from extensions path")
      assert(j.count() === 2L) // the two identical single-token pairs (J = 1)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("Graft.install applies the same list (source-of-truth parity)") {
    val s2 = spark.newSession()
    graft.Graft.install(s2)
    val installed = s2.experimental.extraOptimizations
    GraftOptimizations.rules.foreach { r =>
      assert(installed.contains(r), s"install() missing rule $r")
    }
    assert(GraftOptimizations.rules.size === 5)
  }
}
