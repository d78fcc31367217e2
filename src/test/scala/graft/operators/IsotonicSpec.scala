package graft.operators

import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Long, Long, Long)]): Map[Long, Long] =
    Isotonic.fit(rows.toDF("x", "w", "p"), "x", "w", "p")
      .select("x", "fitted_q").as[(Long, Long)].collect().toMap

  test("a violating middle bin pools with its neighbor (the PAV fixture)") {
    // rates .75, .25, .5 → PAV pools bins 1–2 to (3+1)/8 = .5, then
    // {.5, .5} is already level with bin 3's .5 → all .5
    val got = fit(Seq((1L, 4L, 3L), (2L, 4L, 1L), (3L, 4L, 2L)))
    val half = Isotonic.RateQ / 2
    assert(got === Map(1L -> half, 2L -> half, 3L -> half))
  }

  test("an already-monotone table is returned unchanged (quantized)") {
    val got = fit(Seq((1L, 4L, 1L), (2L, 4L, 2L), (3L, 4L, 3L)))
    val q = Isotonic.RateQ
    assert(got === Map(1L -> q / 4, 2L -> q / 2, 3L -> 3 * q / 4))
  }

  test("output is always non-decreasing in x, with weights respected") {
    // heavy low-rate bin after a light high-rate bin: the pool must
    // sit near the heavy bin's rate: (9+1)/(10+90) = .1 of RateQ
    val got = fit(Seq((1L, 10L, 9L), (2L, 90L, 1L)))
    assert(got(1L) === got(2L))
    assert(got(1L) === Isotonic.RateQ / 10)
    // and a general shuffle of rates still yields a sorted sequence
    val g2 = fit(Seq((1L, 3L, 2L), (2L, 5L, 1L), (3L, 2L, 2L), (4L, 7L, 3L)))
    val seq = g2.toSeq.sortBy(_._1).map(_._2)
    assert(seq === seq.sorted)
  }

  test("boundary bins: all-positive and all-negative stay exact") {
    val got = fit(Seq((1L, 5L, 0L), (2L, 5L, 5L)))
    assert(got === Map(1L -> 0L, 2L -> Isotonic.RateQ))
  }
}
