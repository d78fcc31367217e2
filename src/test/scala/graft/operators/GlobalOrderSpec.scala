package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalOrder must be value-identical to the single-partition window
  * forms it replaces — the helpers exist to change the PLAN, never
  * the answer.
  */
class GlobalOrderSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // ties in the sort value, scattered nulls, an ALL-NULL leading
    // group (grp 0 — the running sum must be NULL there, not 0), and
    // enough rows to span the 4 test shuffle partitions
    (1 to 257).map { i =>
      (i.toLong, (i % 17).toLong, if (i % 17 == 0 || i % 29 == 0) null
      else new java.math.BigDecimal(s"${(i * 7) % 100}.${i % 100}"))
    }.toDF("id", "grp", "amt")
      .withColumn("amt", col("amt").cast("decimal(18,2)"))
  }

  test("zipRank equals row_number over the same global order") {
    import spark.implicits._
    val df = fixture
    val got = GlobalOrder.zipRank(df.sort($"grp", $"id"), "r")
      .select($"id", $"r")
    val want = df.select($"id",
      row_number().over(Window.orderBy($"grp", $"id")).cast("long").as("r"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("zipRankWithCount returns the input cardinality") {
    val df = fixture
    val (ranked, n) = GlobalOrder.zipRankWithCount(df.sort(col("id")), "r")
    assert(n === 257L)
    assert(ranked.count() === 257L)
  }

  test("runningSum equals sum over an unbounded-preceding window, incl. NULL prefix") {
    import spark.implicits._
    val df = fixture
    val got = GlobalOrder.runningSum(df, Seq($"grp", $"id"), "amt", "cum")
      .select($"id", $"cum".cast("decimal(38,2)"))
    val want = df.select($"id",
      sum($"amt").over(Window.orderBy($"grp", $"id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(38,2)").as("cum"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // the all-NULL leading group really is NULL, not 0 (SQL SUM over
    // an all-NULL frame)
    assert(got.filter($"cum".isNull).count() > 0)
  }

  test("runningSum rejects non-decimal value columns") {
    val df = fixture
    intercept[IllegalArgumentException] {
      GlobalOrder.runningSum(df, Seq(col("id")), "grp", "cum")
    }
  }

  test("ntileRank equals ntile() for even, ragged, and n<k cardinalities") {
    import spark.implicits._
    for (k <- Seq(1, 4, 10, 257, 300)) {
      val df = fixture
      val got = GlobalOrder.ntileRank(df, Seq($"grp", $"id"), k, "b")
        .select($"id", $"b")
      val want = df.select($"id",
        ntile(k).over(Window.orderBy($"grp", $"id")).cast("long").as("b"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"k=$k")
    }
  }

  test("two-pass offsets are consistent on an empty frame") {
    import spark.implicits._
    val empty = fixture.filter($"id" < 0)
    assert(GlobalOrder.zipRank(empty.sort($"id"), "r").count() === 0)
    assert(GlobalOrder.runningSum(empty, Seq($"id"), "amt", "c").count() === 0)
    assert(GlobalOrder.ntileRank(empty, Seq($"id"), 5, "b").count() === 0)
  }
}
