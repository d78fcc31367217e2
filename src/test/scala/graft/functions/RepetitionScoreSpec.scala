package graft.functions

import graft.SparkSpec
import graft.operators.Boilerplate
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The single-pass RepetitionScore expression must be value-identical
  * to the composed-Catalyst form it replaced (ngrams → array_distinct
  * → sizes → r4) — the q63 oracle pins that algebra, so the fast path
  * is checked against the slow one here on the real fixture plus the
  * edge shapes the fixture can't contain.
  */
class RepetitionScoreSpec extends SparkSpec {

  /** The pre-r4 composed form, verbatim. */
  private def composed(textCol: Column, n: Int): Column = {
    val g = Boilerplate.ngrams(textCol, n)
    when(size(g) === 0, lit(0.0))
      .otherwise(TextFunctions.r4(lit(1.0) - size(array_distinct(g)).cast("double") / size(g)))
  }

  private def check(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    val diff = df
      .select(
        Boilerplate.repetitionRatio(col("text"), n).as("fast"),
        composed(col("text"), n).as("slow"))
      .filter(not(col("fast") <=> col("slow")))
    assert(diff.count() == 0L, s"n=$n: ${diff.take(3).mkString(",")}")
  }

  test("matches the composed form on the documents fixture (n=2,3,5)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(2, 3, 5).foreach(check(docs, _))
  }

  test("edge shapes: null, empty, blank, short, all-same, exotic whitespace") {
    import spark.implicits._
    val df = Seq(
      null.asInstanceOf[String],
      "",
      "   \t\n  ",
      "one",
      "one two",
      "a a a a a a a a",
      "x y x y x y",
      "a\tb\ncd\fe\rf  g",
      "trailing space ",
      " leading space").toDF("text")
    Seq(1, 2, 3, 4).foreach(check(df, _))
  }

  test("packed-long overflow falls back without changing values") {
    import spark.implicits._
    // two distinct tokens at n=64: 1 bit/id × 64 > 63 → string-set path
    val text = (0 until 70).map(i => if (i % 2 == 0) "a" else "b").mkString(" ")
    val df = Seq(text).toDF("text")
    check(df, 64)
    val v = df.select(Boilerplate.repetitionRatio($"text", 64).as("r"))
      .head.getDouble(0)
    // windows of the alternating stream repeat with period 2: 7 windows, 2 distinct
    assert(v == math.floor((1.0 - 2.0 / 7.0) * 10000 + 0.5) / 10000)
  }

  test("expression stays inside whole-stage codegen") {
    // a local-relation Seq would collapse to LocalTableScan before
    // codegen has anything to fuse — use the parquet scan path, the
    // shape q63 actually runs
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Boilerplate.repetitionRatio(col("text"), 2).as("r"))
    val fused = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(fused.nonEmpty, df.queryExecution.executedPlan.toString)
    df.collect()  // and the generated code actually compiles + runs
  }
}
