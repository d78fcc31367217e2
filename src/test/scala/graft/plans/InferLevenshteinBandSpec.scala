package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-band inference for edit-distance thresholds
  * (plans.InferLevenshteinBand): the band conjunct appears in the
  * optimized plan, results are unchanged (equivalence, incl. nulls
  * and NOT contexts), the thresholded 3-arg form is left alone, and
  * the injection is idempotent across optimizer iterations.
  */
class InferLevenshteinBandSpec extends SparkSpec {

  private def fresh = {
    val s = spark.newSession()
    GraftOptimizations.install(s)
    s
  }

  /** Parquet round-trip so literals don't constant-fold away. */
  private def fixture(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("levband").toString
    Seq(
      ("kitten", "sitting"),       // lev 3
      ("flaw", "lawn"),            // lev 2
      ("abc", "abc"),              // lev 0
      ("a", "abcdef"),             // band-prunable: |len diff| 5
      (null.asInstanceOf[String], "x"),
      ("y", null.asInstanceOf[String]))
      .toDF("a", "b").write.mode("overwrite").parquet(tmp)
    s.read.parquet(tmp)
  }

  test("band conjunct is injected and results are unchanged") {
    val s = fresh
    val df = fixture(s)
    val q = df.filter(levenshtein(col("a"), col("b")) <= 2)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs((length(a") || opt.contains("abs((length("),
      s"band not injected:\n$opt")
    val got = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("flaw", "lawn"), ("abc", "abc")), s"got $got")
    // exactly one band per predicate — idempotent across the
    // optimizer's fixed-point iterations
    assert("abs\\(".r.findAllIn(opt).size == 1, s"duplicated band:\n$opt")
  }

  test("equivalence under NOT") {
    val s = fresh
    val df = fixture(s)
    val got = df.filter(!(levenshtein(col("a"), col("b")) <= 2))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // NOT(null) filters out the null rows exactly like stock Spark
    assert(got == Set(("kitten", "sitting"), ("a", "abcdef")), s"got $got")
  }

  test("3-arg thresholded levenshtein is NOT rewritten") {
    val s = fresh
    val df = fixture(s)
    val q = df.filter(expr("levenshtein(a, b, 1) <= 2"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("abs("), s"unsafe rewrite of 3-arg form:\n$opt")
    // the thresholded form returns -1 above threshold → every
    // non-null row passes -1 <= 2 except true matches at <= 1
    assert(q.count() == 4L)
  }

  test("fires inside a join condition (the fuzzy-join shape)") {
    val s = fresh
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("levband2").toString
    Seq("kitten", "mitten", "abcdef").toDF("w").write
      .mode("overwrite").parquet(tmp)
    val l = s.read.parquet(tmp).select(col("w").as("wa"))
    val r = s.read.parquet(tmp).select(col("w").as("wb"))
    val j = l.join(r, levenshtein(col("wa"), col("wb")) <= 1 &&
      col("wa") < col("wb"))
    val opt = j.queryExecution.optimizedPlan.toString
    assert(opt.contains("abs("), s"band not injected into join:\n$opt")
    val got = j.collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(got == Set(("kitten", "mitten")), s"got $got")
  }
}
