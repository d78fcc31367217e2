package graft.operators

import graft.SparkSpec

/** L2 gradient boosting (operators.GradientBoost): hand-computed
  * first round on a 4-point series, training-curve monotonicity, and
  * layout invariance of the full fit.
  */
class GradientBoostSpec extends SparkSpec {

  test("hand-computed round 1: split, leaf means, residual SSE") {
    import spark.implicits._
    // x = 1..4, y = 1e5..4e5. Decile thresholds floor to {1,2,3}.
    // Gains: ≤1 → 1e10+8.1e11/3 = 2.8e11; ≤2 → 4.5e10+2.45e11 =
    // 2.9e11; ≤3 → 3.6e11/3+1.6e11 = 2.8e11 → best thr=2.
    // γL = fdiv(fdiv(3e5,2),2) = 75000, γR = fdiv(fdiv(7e5,2),2) =
    // 175000; residuals 25e3,125e3,125e3,225e3 → SSE 8.25e10 →
    // sse_cq 82500.
    val rows = Seq((1L, 100000L), (2L, 200000L), (3L, 300000L), (4L, 400000L))
      .toDF("x0", "yc")
    val (r1, sse1) = GradientBoost.fit(rows, Seq("x0"), "yc", 1).head
    assert(r1.dim == 0 && r1.thr == 2L, s"got $r1")
    assert(r1.nL == 2L && r1.gammaL == 75000L && r1.gammaR == 175000L)
    assert(r1.gainCq == 290000L, s"got ${r1.gainCq}")
    assert(sse1 == 82500L, s"got $sse1")
  }

  test("training SSE is non-increasing across rounds") {
    import spark.implicits._
    val rows = (1 to 200).map { i =>
      val x = (i * 2654435761L) % 100L
      (x, (i % 7).toLong, x * 1000L + (i % 13) * 500L)
    }.toDF("x0", "x1", "yc")
    val fit = GradientBoost.fit(rows, Seq("x0", "x1"), "yc", 4)
    val sses = fit.map(_._2)
    assert(sses.zip(sses.tail).forall { case (a, b) => b <= a }, s"got $sses")
  }

  test("fit is layout invariant") {
    import spark.implicits._
    val rows = (1 to 120).map { i =>
      ((i * 37L) % 50L, (i * 11L) % 9L, (i * 97L) % 100000L)
    }.toDF("x0", "x1", "yc")
    val a = GradientBoost.fit(rows.repartition(1), Seq("x0", "x1"), "yc", 3)
    val b = GradientBoost.fit(rows.repartition(6), Seq("x0", "x1"), "yc", 3)
    assert(a == b)
  }
}
