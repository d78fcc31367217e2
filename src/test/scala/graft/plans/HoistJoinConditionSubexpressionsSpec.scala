package graft.plans

import java.util.concurrent.atomic.AtomicLong

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-condition subexpression hoisting
  * (plans.HoistJoinConditionSubexpressions): heavy single-side
  * subtrees move into Projects under the join (per-ROW evaluation),
  * results are unchanged, cheap conditions are left alone, outer
  * joins are left alone, and the rewrite is idempotent. A counting
  * UDF proves the per-pair → per-row evaluation-count change
  * directly.
  */
class HoistJoinConditionSubexpressionsSpec extends SparkSpec {

  private def fresh = {
    val s = spark.newSession()
    GraftOptimizations.install(s)
    s
  }

  private def docs(s: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hoist").toString
    (1 to n).map(i => (i.toLong, s"w$i common a b c d e f g h"))
      .toDF("id", "t").write.mode("overwrite").parquet(tmp)
    s.read.parquet(tmp)
  }

  private val tok = "array_distinct(filter(split(trim(%s), '\\\\s+'), x -> x <> ''))"
  private def jac(a: String, b: String) =
    s"cast(size(array_intersect(${tok.format(a)}, ${tok.format(b)})) as double)" +
      s" / size(array_union(${tok.format(a)}, ${tok.format(b)}))"

  test("heavy single-side subtrees are hoisted; results unchanged; idempotent") {
    val s = fresh
    val d = docs(s, 12)
    val l = d.select(col("id").as("ia"), col("t").as("ta"))
    val r = d.select(col("id").as("ib"), col("t").as("tb"))
    val q = l.join(r, expr(s"ia < ib AND ${jac("ta", "tb")} >= 0.9"))
    val opt = q.queryExecution.optimizedPlan
    val hoisted = opt.expressions.flatMap(_.collect {
      case a: org.apache.spark.sql.catalyst.expressions.Alias
          if a.name.startsWith("_hoist_") => a.name
    })
    val optStr = opt.toString
    assert(optStr.contains("_hoist_l") && optStr.contains("_hoist_r"),
      s"no hoisted projections:\n$optStr")
    // join CONDITION no longer re-tokenizes: no split() above the join
    val joinNode = opt.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.get
    assert(!joinNode.condition.get.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.StringSplit]),
      s"condition still tokenizes per pair:\n${joinNode.condition.get}")
    // correctness: every pair shares 9 of 11 distinct tokens —
    // J = 9/11 ≈ 0.818, so 0.9 matches nothing and 0.5 matches all
    assert(q.count() === 0L)
    val q2 = l.join(r, expr(s"ia < ib AND ${jac("ta", "tb")} >= 0.5"))
    assert(q2.count() === (12L * 11L) / 2L)
  }

  test("the hoisted plan evaluates the heavy expr per ROW, not per PAIR") {
    val s = fresh
    import s.implicits._
    HoistSpecCounter.n.set(0L)
    s.udf.register("counted_tok",
      (t: String) => { HoistSpecCounter.n.incrementAndGet(); t.split(" ").distinct })
    val d = docs(s, 10)
    val l = d.select(col("id").as("ia"), col("t").as("ta"))
    val r = d.select(col("id").as("ib"), col("t").as("tb"))
    // the UDF is deterministic-marked by default and single-side; it
    // rides along a hoisted heavy subtree (size of a distinct array)
    val cond = expr("ia < ib AND " +
      "size(array_intersect(counted_tok(ta), counted_tok(tb))) >= 0")
    val n = l.join(r, cond).count()
    assert(n === (10L * 9L) / 2L)
    val evals = HoistSpecCounter.n.get()
    // per-pair would be ≥ 2 × 45 = 90; per-row is ≤ 2 × 10 (+ retries)
    assert(evals <= 40L, s"heavy expr evaluated $evals times — still per-pair")
  }

  test("cheap join conditions are left alone") {
    val s = fresh
    val d = docs(s, 6)
    val l = d.select(col("id").as("ia"), col("t").as("ta"))
    val r = d.select(col("id").as("ib"), col("t").as("tb"))
    val q = l.join(r, expr("ia < ib AND length(ta) = length(tb)"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("_hoist_"),
      "cheap condition must not be rewritten")
    assert(q.count() > 0L)
  }

  test("outer joins are left alone (conservative scope)") {
    val s = fresh
    val d = docs(s, 6)
    val l = d.select(col("id").as("ia"), col("t").as("ta"))
    val r = d.select(col("id").as("ib"), col("t").as("tb"))
    val q = l.join(r,
      expr(s"ia = ib AND ${jac("ta", "tb")} >= 0.0"), "left_outer")
    assert(!q.queryExecution.optimizedPlan.toString.contains("_hoist_"))
    assert(q.count() === 6L)
  }

  test("q345 plans through the hoist (tokenization once per row)") {
    val q = graft.QueryDef.all.find(_.name == "q345_jaccard_user_band").get
    val df = q.fn(spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan
    assert(opt.toString.contains("_hoist_"), s"q345 not hoisted:\n$opt")
    val joinNode = opt.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.get
    assert(!joinNode.condition.get.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.StringSplit]))
  }
}

/** Executor-shared eval counter for the per-row proof (local mode:
  * one JVM, so a static AtomicLong sees every invocation). */
object HoistSpecCounter {
  val n = new AtomicLong(0L)
}
