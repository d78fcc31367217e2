package graft.operators

import graft.SparkSpec

/** Pinball-GD quantile regression (operators.QuantileReg):
  * hand-computed first round, loss monotonicity on a linear-ish
  * corpus, and layout invariance of the integer recurrence.
  */
class QuantileRegSpec extends SparkSpec {

  test("hand-computed first round: all-under-prediction full tilt") {
    import spark.implicits._
    // w=(0,0) -> every r = y > 0 -> u = -9 per row:
    // g0 = -27, g1 = -9*(10+20+30) = -540, loss = 9*(1000+2000+3000)
    // w0 <- 0 - fdiv(-27*500, 3) = 4500
    // w1 <- 0 - fdiv(-540*20, 3) = 3600
    val rows = Seq((10L, 1000L), (20L, 2000L), (30L, 3000L)).toDF("x", "y")
    val out = QuantileReg.fit(rows, "x", "y", iterations = 1)
    assert(out === Seq((1L, 4500L, 3600L, 54000L)))
  }

  test("pinball loss improves net over training on an invoice-scale " +
    "linear corpus") {
    import spark.implicits._
    // fixed-step subgradient descent is not per-round monotone; the
    // contract is net improvement at the scale the steps are tuned
    // for (invoice cents: y ~ 1e6, the q293 corpus shape)
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(500) { _ =>
      val x = 100L + rnd.nextInt(4900)
      (x, 1500L * x + rnd.nextInt(200000))
    }.toDF("x", "y")
    val losses = QuantileReg.fit(rows, "x", "y", iterations = 5).map(_._4)
    assert(losses.last < losses.head,
      s"no net improvement: $losses")
  }

  test("layout invariance: repartitioned input trains identically") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = Seq.tabulate(200)(_ =>
      (100L + rnd.nextInt(900), 1000L + rnd.nextInt(9000))).toDF("x", "y")
    val a = QuantileReg.fit(rows, "x", "y", iterations = 3)
    val b = QuantileReg.fit(rows.repartition(9), "x", "y", iterations = 3)
    assert(a === b)
  }
}
