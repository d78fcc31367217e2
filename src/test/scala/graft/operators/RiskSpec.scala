package graft.operators

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Financial-risk primitives (operators.Risk): hand-computed drawdown
  * trajectory, VaR/ES tail semantics on a known delta set, the DW ≈ 2
  * behaviour on an alternating residual pattern, and layout
  * invariance for all three (day order must come from the data, not
  * partition order).
  */
class RiskSpec extends SparkSpec {

  private def d(day: Int): Date = Date.valueOf(f"2024-07-$day%02d")

  test("drawdown: hand-computed cum/peak/dd trajectory") {
    import spark.implicits._
    val df = Seq((d(1), 10L), (d(2), -4L), (d(3), 7L), (d(4), -20L), (d(5), 2L))
      .toDF("day", "xq")
    val out = Risk.drawdown(df, "day", "xq")
      .select($"cum", $"peak", $"dd")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (10L, 10L, 0L),
      (6L, 10L, 4L),
      (13L, 13L, 0L),
      (-7L, 13L, 20L),
      (-5L, 13L, 18L)), s"got $out")
  }

  test("varEs: interpolated quantile and tail mean on known deltas") {
    import spark.implicits._
    // series 0,10,30,60,20,25 → deltas 10,20,30,-40,5 → sorted
    // -40,5,10,20,30; p=0.25 → pos=1.0 → VaR = 5 exactly; tail
    // {-40,5} → ES mean = -17.5 → -17500000 micro
    val xs = Seq(0L, 10L, 30L, 60L, 20L, 25L)
    val df = xs.zipWithIndex.map { case (v, i) => (d(i + 1), v) }
      .toDF("day", "xq")
    val out = Risk.varEs(df, "day", "xq", 0.25)
      .select($"n_days", $"var_p", $"es_micro", $"n_tail")
      .as[(Long, Double, Long, Long)].head()
    assert(out == ((6L, 5.0, -17500000L, 2L)), s"got $out")
  }

  test("durbinWatson: perfect line has zero residuals guarded; " +
    "alternating residuals push DW toward 4") {
    import spark.implicits._
    // y = 100·t + alternating ±1: slope_milli ≈ 100000, residuals
    // alternate sign, so Σ(Δe)² ≈ 4·Σe² → dw_micro near 4e6.
    // Days span two months so all 40 are distinct (deterministic order).
    val df2 = (1 to 40)
      .map(i => (Date.valueOf(f"2024-${i / 28 + 1}%02d-${i % 28 + 1}%02d"),
        100L * i + (if (i % 2 == 0) 1L else -1L)))
      .toDF("day", "xq")
    val out = Risk.durbinWatson(df2, "day", "xq")
      .select($"n", $"dw_micro").as[(Long, Long)].head()
    assert(out._1 == 40L)
    assert(out._2 > 3500000L && out._2 <= 4100000L, s"got $out")
  }

  test("all three are layout invariant") {
    import spark.implicits._
    val df = (1 to 25).map(i => (d(i), 50L + (i * 2654435761L) % 400L))
      .toDF("day", "xq")
    def dd(x: DataFrame) = Risk.drawdown(x, "day", "xq")
      .as[(Date, Long, Long, Long, Long)].collect().toSeq
    def ve(x: DataFrame) = Risk.varEs(x, "day", "xq", 0.05)
      .as[(Long, Double, Long, Long)].collect().toSeq
    def dw(x: DataFrame) = Risk.durbinWatson(x, "day", "xq")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(dd(df.repartition(1)) == dd(df.repartition(6)))
    assert(ve(df.repartition(1)) == ve(df.repartition(6)))
    assert(dw(df.repartition(1)) == dw(df.repartition(6)))
  }
}
