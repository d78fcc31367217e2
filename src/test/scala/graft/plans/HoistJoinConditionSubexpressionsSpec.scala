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

  test("UDFs are NOT hoisted: speculative per-row evaluation could throw on " +
    "rows the join would never pair (the counting UDF proves per-pair stays)") {
    val s = fresh
    import s.implicits._
    HoistSpecCounter.n.set(0L)
    s.udf.register("counted_tok",
      (t: String) => { HoistSpecCounter.n.incrementAndGet(); t.split(" ").distinct })
    val d = docs(s, 10)
    val l = d.select(col("id").as("ia"), col("t").as("ta"))
    val r = d.select(col("id").as("ib"), col("t").as("tb"))
    val cond = expr("ia < ib AND " +
      "size(array_intersect(counted_tok(ta), counted_tok(tb))) >= 0")
    val q = l.join(r, cond)
    assert(!q.queryExecution.optimizedPlan.toString.contains("_hoist_"),
      "opaque UDFs must stay conditionally evaluated in the condition")
    assert(q.count() === (10L * 9L) / 2L)
    // per-pair evaluation preserved: ≥ 2 per evaluated pair (45 pairs
    // reach the non-equi conjunct in this cross shape)
    assert(HoistSpecCounter.n.get() >= 90L)
  }

  test("ANSI-throwing subtrees (narrowing string cast) stay in the join " +
    "condition; their safe inner pieces still hoist") {
    val s = fresh
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hoistansi").toString
    Seq((1L, "7", "x y z a b c"), (2L, "9", "x y z a b"))
      .toDF("id", "num", "t").write.mode("overwrite").parquet(tmp)
    val d = s.read.parquet(tmp)
    val l = d.select(col("id").as("ia"), col("num").as("na"), col("t").as("ta"))
    val r = d.select(col("id").as("ib"), col("t").as("tb"))
    // two-sided conjunct (not pushable), whose LEFT half contains an
    // ANSI-throwing string→int cast: the size() subtrees may hoist,
    // the cast must remain conditionally evaluated in the condition —
    // hoisting it would evaluate per-row, crashing on any malformed
    // row the join would never have paired
    val tokA = "size(array_distinct(filter(split(trim(ta), '\\\\s+'), x -> x <> '')))"
    val tokB = "size(array_distinct(filter(split(trim(tb), '\\\\s+'), x -> x <> '')))"
    val q = l.join(r, expr(s"ia < ib AND cast(na as int) + $tokA >= $tokB"))
    val opt = q.queryExecution.optimizedPlan
    val joinNode = opt.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.get
    def hasStringCast(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e.exists {
        case c: org.apache.spark.sql.catalyst.expressions.Cast =>
          c.child.dataType == org.apache.spark.sql.types.StringType
        case _ => false
      }
    assert(hasStringCast(joinNode.condition.get),
      s"narrowing cast left the condition:\n${joinNode.condition.get}")
    assert(q.count() === 1L)
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

  test("non-foldable regex patterns are NOT hoisted: a malformed pattern on " +
    "a row the join never pairs must not throw speculatively") {
    val s = fresh
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hoistrx").toString
    // row k=2 carries a malformed regex "(" — stock Spark never
    // evaluates it because no right row has k=2; hoisting split(ta, pa)
    // into an unconditional Project would crash this query
    Seq((1L, "x y z", "\\s+"), (2L, "a b c", "("))
      .toDF("k", "t", "p").write.mode("overwrite").parquet(tmp)
    val d = s.read.parquet(tmp)
    val tmpR = java.nio.file.Files.createTempDirectory("hoistrxr").toString
    Seq((1L, "x y")).toDF("k", "t").write.mode("overwrite").parquet(tmpR)
    val l = d.select(col("k").as("ka"), col("t").as("ta"), col("p").as("pa"))
    val r = s.read.parquet(tmpR).select(col("k").as("kb"), col("t").as("tb"))
    // two-sided conjunct (not pushable below the join): its LEFT
    // subtree uses a column-valued pattern and must NOT hoist; the
    // right subtree's pattern is a literal and may
    val q = l.join(r,
      expr("ka = kb AND size(split(ta, pa)) >= size(array_distinct(split(tb, ' ')))"))
    val joinNode = q.queryExecution.optimizedPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.get
    def splitWithColumnPattern(
        e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e.exists {
        case sp: org.apache.spark.sql.catalyst.expressions.StringSplit =>
          !sp.regex.foldable
        case _ => false
      }
    assert(splitWithColumnPattern(joinNode.condition.get),
      "split with a column-valued pattern must stay in the condition:\n" +
        joinNode.condition.get)
    assert(q.count() === 1L) // and in particular: does not throw
    // sanity: the same shape with LITERAL patterns both sides hoists
    val q2 = l.join(r, expr("ka = kb AND " +
      "size(array_distinct(split(ta, '\\\\s+'))) >= size(array_distinct(split(tb, ' ')))"))
    assert(q2.queryExecution.optimizedPlan.toString.contains("_hoist_"),
      "literal-pattern tokenization should still hoist")
    assert(q2.count() === 1L)
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
