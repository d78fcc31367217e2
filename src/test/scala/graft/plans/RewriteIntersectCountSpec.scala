package graft.plans

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RewriteIntersectCountSpec extends SparkSpec {

  private def fresh = {
    val s = spark.newSession()
    GraftOptimizations.install(s)
    s
  }

  test("size(array_intersect) over sort_array(array_distinct) rewrites to the native merge-count") {
    val s = fresh
    import s.implicits._
    // literal relations constant-fold before the plan is inspectable —
    // round-trip through parquet so the expression survives to the
    // optimized plan
    val tmp = java.nio.file.Files.createTempDirectory("ric1").toString
    Seq(
      ("a b c d", "c d e"),
      ("x", "y"),
      ("dup dup dup z", "dup z q"),
      ("", "a"))
      .toDF("ta", "tb").write.mode("overwrite").parquet(tmp)
    val df = s.read.parquet(tmp)
    def toks(c: String) = sort_array(array_distinct(
      filter(split(col(c), " "), t => length(t) > 0)))
    val q = df.select(
      size(array_intersect(toks("ta"), toks("tb"))).as("n"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("sorted_intersect_count"), s"rewrite did not fire:\n$opt")
    assert(!opt.contains("array_intersect"), s"stock intersect survived:\n$opt")
    // parquet read order is not row order — compare as a sorted multiset
    assert(q.as[Int].collect().toSeq.sorted === Seq(0, 0, 2, 2))
  }

  test("bigint element arrays rewrite too, with identical counts to the stock plan") {
    val s = fresh
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ric2").toString
    Seq(
      (Seq(3L, 1L, 2L, 2L), Seq(2L, 3L, 9L)),
      (Seq.empty[Long], Seq(1L)))
      .toDF("xa", "xb").write.mode("overwrite").parquet(tmp)
    val df = s.read.parquet(tmp)
    // parquet array elements read back nullable — the guard rightly
    // declines there (asserted below); a provably non-null transform
    // (coalesce inside transform => containsNull = false) re-arms it
    def sdN(c: String) = sort_array(array_distinct(col(c)))
    val qNullable = df.select(size(array_intersect(sdN("xa"), sdN("xb"))).as("n"))
    assert(!qNullable.queryExecution.optimizedPlan.toString
      .contains("sorted_intersect_count"))
    def sd(c: String) = sort_array(array_distinct(
      transform(col(c), x => coalesce(x, lit(0L)))))
    val q = df.select(size(array_intersect(sd("xa"), sd("xb"))).as("n"))
    assert(q.queryExecution.optimizedPlan.toString.contains("sorted_intersect_count"))
    assert(q.as[Int].collect().toSeq.sorted === Seq(0, 2))
    // same results on the base session without the rule installed
    val plain = df.sparkSession.newSession().createDataFrame(df.collect().toSeq.asJava, df.schema)
      .select(size(array_intersect(
        sort_array(array_distinct(col("xa"))),
        sort_array(array_distinct(col("xb"))))).as("n"))
    assert(plain.collect().map(_.getInt(0)).toSeq === Seq(2, 0))
  }

  test("guards: bare attributes and unsorted inputs do NOT rewrite") {
    val s = fresh
    import s.implicits._
    val df = Seq((Seq(3L, 1L), Seq(1L, 3L))).toDF("xa", "xb")
    // bare attributes: sortedness not provable → stock plan kept
    val q1 = df.select(size(array_intersect($"xa", $"xb")).as("n"))
    assert(!q1.queryExecution.optimizedPlan.toString.contains("sorted_intersect_count"))
    assert(q1.as[Int].collect().toSeq === Seq(2))
    // distinct without sort: not provably sorted → stock plan kept
    val q2 = df.select(size(array_intersect(
      array_distinct($"xa"), array_distinct($"xb"))).as("n"))
    assert(!q2.queryExecution.optimizedPlan.toString.contains("sorted_intersect_count"))
    assert(q2.as[Int].collect().toSeq === Seq(2))
  }

  test("null arrays propagate NULL exactly like the stock size(array_intersect)") {
    val s = fresh
    import s.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(2L, 3L))),
      (None: Option[Seq[Long]], Some(Seq(1L)))).toDF("xa", "xb")
    def sd(c: String) = sort_array(array_distinct(col(c)))
    val q = df.select(size(array_intersect(sd("xa"), sd("xb"))).as("n"))
    val got = q.collect()
    assert(got(0).getInt(0) === 1)
    assert(got(1).isNullAt(0))
  }
}
