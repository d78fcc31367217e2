package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PushPredicateThroughExplodeSpec extends SparkSpec {

  private def fresh = {
    val s = spark.newSession()
    GraftOptimizations.install(s)
    s
  }

  test("rewrite fires for explode+filter and preserves results exactly") {
    val s = fresh
    import s.implicits._
    val df = Seq(
      (1L, Seq("a", "bb", "ccc", "dddd")),
      (2L, Seq.empty[String]),
      (3L, Seq("x")),
      (4L, (null: Seq[String])),
      (5L, Seq(null, "long-enough", "no"))
    ).toDF("id", "arr")
    val q = df.select($"id", explode($"arr").as("w")).filter(length($"w") > 2)

    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("filter("), s"array_filter not injected:\n$optimized")

    val expected = Seq((1L, "ccc"), (1L, "dddd"), (5L, "long-enough"))
    assert(q.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq === expected)

    // same data WITHOUT the rule: identical results
    import spark.implicits._
    val plainQ = df.select(col("id"), explode(col("arr")).as("w")).filter(length(col("w")) > 2)
    assert(plainQ.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq === expected)
  }

  test("mixed conjuncts: only element-level parts pushed, rest stays") {
    val s = fresh
    import s.implicits._
    val df = Seq((1L, Seq("aa", "bbbb")), (2L, Seq("cccc", "d"))).toDF("id", "arr")
    val q = df.select($"id", explode($"arr").as("w"))
      .filter(length($"w") > 2 && $"id" === 2L)
    assert(q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "cccc")))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("filter("))           // pushed element predicate
    // the id predicate must NOT leak into the lambda (Catalyst may
    // evaluate it elsewhere, e.g. fold it into the LocalRelation)
    val lambda = opt.linesIterator.find(_.contains("lambdafunction")).get
    assert(!lambda.contains("id#"))
  }

  test("guards: posexplode and outer explode are NOT rewritten") {
    val s = fresh
    import s.implicits._
    val df = Seq((1L, Seq("a", "bb", "ccc"))).toDF("id", "arr")

    val pos = df.select($"id", posexplode($"arr").as(Seq("i", "w"))).filter(length($"w") > 1)
    assert(!pos.queryExecution.optimizedPlan.toString.contains("filter("),
      "posexplode must keep original ordinals")
    // ordinals preserved: 'bb' is still index 1, 'ccc' index 2
    assert(pos.collect().map(r => (r.getInt(1), r.getString(2))).sorted.toSeq ===
      Seq((1, "bb"), (2, "ccc")))

    val outer = Seq((1L, Seq("x"))).toDF("id", "arr")
      .select($"id", explode_outer($"arr").as("w")).filter(length($"w") > 5)
    assert(outer.collect().isEmpty)           // semantics: no null-row resurrection
  }
}
