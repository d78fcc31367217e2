package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Size-ratio band inference for Jaccard thresholds
  * (plans.InferJaccardSizeBand): the band conjunct appears in the
  * optimized plan, results are unchanged (equivalence, incl. nulls,
  * empty sets, and NOT contexts), non-distinct inputs are left
  * alone, and the injection is idempotent across optimizer
  * iterations.
  */
class InferJaccardSizeBandSpec extends SparkSpec {

  private def fresh = {
    val s = spark.newSession()
    GraftOptimizations.install(s)
    s
  }

  /** Parquet round-trip so literals don't constant-fold away. */
  private def fixture(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("jacband").toString
    Seq(
      ("a b c d", "a b c d"),       // J = 1
      ("a b c d", "a b c e"),       // J = 3/5 = 0.6
      ("a b c d e f g h i j", "a"), // J = 0.1, band-prunable at 0.5
      (null.asInstanceOf[String], "x y"),
      ("p q", null.asInstanceOf[String]))
      .toDF("ta", "tb").write.mode("overwrite").parquet(tmp)
    s.read.parquet(tmp)
  }

  /** The user-written similarity predicate shape (split produces a
    * non-distinct array, so wrap in array_distinct — the guard the
    * rule requires). split("") yields [""] — filter it so the empty
    * string becomes the empty SET.
    */
  private val jac =
    """cast(size(array_intersect(array_distinct(filter(split(ta, ' '), x -> x <> '')),
      |                          array_distinct(filter(split(tb, ' '), x -> x <> '')))) as double) /
      | size(array_union(array_distinct(filter(split(ta, ' '), x -> x <> '')),
      |                  array_distinct(filter(split(tb, ' '), x -> x <> ''))))""".stripMargin

  test("band conjunct is injected and results are unchanged") {
    val s = fresh
    val df = fixture(s)
    val q = df.filter(expr(s"$jac >= 0.5"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("(0.5 * "), s"band not injected:\n$opt")
    val got = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a b c d", "a b c d"), ("a b c d", "a b c e")), s"got $got")
    // exactly one band (two halves) per predicate — idempotent across
    // the optimizer's fixed-point iterations
    assert("\\(0\\.5 \\* ".r.findAllIn(opt).size == 2, s"duplicated band:\n$opt")
  }

  test("ANSI 0/0 error is preserved, not short-circuited away by the band") {
    val s = fresh
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("jacband0").toString
    // both-empty sets: the only divide-by-zero case. The band there is
    // t·0 <= 0 = TRUE, so the user predicate is still evaluated and
    // raises exactly the error stock Spark raises under ANSI.
    Seq(("", "")).toDF("ta", "tb").write.mode("overwrite").parquet(tmp)
    val df = s.read.parquet(tmp)
    val q = df.filter(expr(s"$jac >= 0.5"))
    assert(q.queryExecution.optimizedPlan.toString.contains("(0.5 * "))
    val e = intercept[Exception](q.collect())
    assert(e.getMessage.contains("DIVIDE_BY_ZERO") ||
      Option(e.getCause).exists(_.getMessage.contains("DIVIDE_BY_ZERO")),
      s"expected the stock ANSI divide-by-zero, got: $e")
  }

  test("equivalence under NOT (null rows drop on both sides)") {
    val s = fresh
    val df = fixture(s)
    val got = df.filter(!expr(s"$jac >= 0.5"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // NOT(null) filters out the null rows and the 0/0 empty-set row
    // exactly like stock Spark
    assert(got == Set(("a b c d e f g h i j", "a")), s"got $got")
  }

  test("strict > threshold also bands; reversed literal-first form too") {
    val s = fresh
    val df = fixture(s)
    val q1 = df.filter(expr(s"$jac > 0.9"))
    assert(q1.queryExecution.optimizedPlan.toString.contains("(0.9 * "))
    assert(q1.count() == 1L)
    val q2 = df.filter(expr(s"0.5 <= $jac"))
    assert(q2.queryExecution.optimizedPlan.toString.contains("(0.5 * "))
    assert(q2.count() == 2L)
  }

  test("non-distinct inputs are NOT rewritten (duplicates break the bound)") {
    val s = fresh
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("jacband2").toString
    // 4 copies of x vs [x]: J over the deduped sets is 1, but the raw
    // band 0.5·4 <= 1 is false — the rule must decline on bare split()
    Seq(("x x x x", "x")).toDF("ta", "tb").write.mode("overwrite").parquet(tmp)
    val df = s.read.parquet(tmp)
    val raw =
      """cast(size(array_intersect(split(ta, ' '), split(tb, ' '))) as double) /
        | size(array_union(split(ta, ' '), split(tb, ' ')))""".stripMargin
    val q = df.filter(expr(s"$raw >= 0.5"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("(0.5 * "), s"unsafe rewrite of non-distinct inputs:\n$opt")
    assert(q.count() == 1L) // J = 1/1 = 1 passes
  }

  test("fires inside a join condition and prunes before the set arithmetic") {
    val s = fresh
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("jacband3").toString
    Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "a b c d e f g h i j k l"))
      .toDF("id", "t").write.mode("overwrite").parquet(tmp)
    val l = s.read.parquet(tmp).select(col("id").as("ida"), col("t").as("ta"))
    val r = s.read.parquet(tmp).select(col("id").as("idb"), col("t").as("tb"))
    val j = l.join(r, expr(s"$jac >= 0.5") && col("ida") < col("idb"))
    val opt = j.queryExecution.optimizedPlan.toString
    assert(opt.contains("(0.5 * "), s"band not injected into join:\n$opt")
    val got = j.select("ida", "idb").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"got $got")
  }

  test("declared q345 plans through the rule (band in the join condition)") {
    val q = graft.QueryDef.all.find(_.name == "q345_jaccard_user_band").get
    val df = q.fn(spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("(0.6 * "), s"q345 not banded:\n$opt")
  }

  test("containment |A∩B|/|A| >= t injects the one-sided band and results " +
    "are unchanged (incl. NOT)") {
    val s = fresh
    val df = fixture(s)
    val con =
      """cast(size(array_intersect(array_distinct(filter(split(ta, ' '), x -> x <> '')),
        |                          array_distinct(filter(split(tb, ' '), x -> x <> '')))) as double) /
        | size(array_distinct(filter(split(ta, ' '), x -> x <> '')))""".stripMargin
    val q = df.filter(expr(s"$con >= 0.5"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("(0.5 * "), s"containment band not injected:\n$opt")
    // exactly ONE half (the one-sided bound), not the jaccard pair
    assert("\\(0\\.5 \\* ".r.findAllIn(opt).size == 1, s"two-sided band leaked:\n$opt")
    val got = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // containment of the 10-token doc in the 1-token doc is 0.1 (pruned);
    // identical docs are 1.0; abc-vs-abe shares 3 of 4 source tokens
    assert(got == Set(("a b c d", "a b c d"), ("a b c d", "a b c e")), s"got $got")
    val notGot = df.filter(!expr(s"$con >= 0.5"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(notGot == Set(("a b c d e f g h i j", "a")), s"NOT diverged: $notGot")
  }

  test("sort_array(array_distinct(...)) shape composes with RewriteIntersectCount") {
    val s = fresh
    val df = fixture(s)
    val sorted =
      """cast(size(array_intersect(sort_array(array_distinct(filter(split(ta, ' '), x -> x <> ''))),
        |                          sort_array(array_distinct(filter(split(tb, ' '), x -> x <> ''))))) as double) /
        | size(array_union(sort_array(array_distinct(filter(split(ta, ' '), x -> x <> ''))),
        |                  sort_array(array_distinct(filter(split(tb, ' '), x -> x <> '')))))""".stripMargin
    val q = df.filter(expr(s"$sorted >= 0.5"))
    val opt = q.queryExecution.optimizedPlan.toString
    // both rules fire: the size band AND the native merge-count
    assert(opt.contains("(0.5 * "), s"band not injected:\n$opt")
    assert(opt.contains("sorted_intersect_count"), s"intersect-count rewrite lost:\n$opt")
    assert(q.count() == 2L)
  }
}
