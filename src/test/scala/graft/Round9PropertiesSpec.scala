package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property invariants for the round-9 members — pure-arithmetic
  * properties checked WITHOUT Spark (the distributed plumbing is
  * covered by the operator specs and oracles):
  *  - quantile-sketch read-out: the bucket-upper-edge estimate never
  *    undershoots the true order statistic and overshoots by < W,
  *    at every percentile, for arbitrary data and widths;
  *  - NDCG discounts: strictly decreasing, bounded by 10⁶, and the
  *    prefix sums (IDCG table) strictly increasing — the properties
  *    the ppm division relies on;
  *  - streaming-HLL estimate: the scalar read-out is invariant to
  *    register-array ordering perturbations that preserve multiset
  *    (the order-free-sum claim), and grows monotonically under
  *    register-wise max;
  *  - bootstrap weights: the truncated-Poisson CDF thresholds are
  *    strictly increasing in (0, 1) — the well-formedness the CASE
  *    ladder needs for determinism.
  */
class Round9PropertiesSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("quantile sketch estimate ∈ [true, true + W) at every percentile") {
    val dataGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 500000L))
    val wGen = Gen.chooseNum(1L, 1000L)
    val pctGen = Gen.chooseNum(1, 100)
    check(Prop.forAll(dataGen, wGen, pctGen) { (xs, w, pct) =>
      val sorted = xs.sorted
      val n = sorted.length.toLong
      val rank = (pct * n + 99L) / 100L
      val exact = sorted((rank - 1).toInt)
      // the sketch read-out, scalar form: counts per bucket, first
      // bucket whose cumulative reaches rank, upper-edge estimate
      val buckets = xs.groupBy(_ / w).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val b = buckets.find { case (_, c) => cum += c; cum >= rank }.get._1
      val est = b * w + (w - 1)
      est >= exact && est - exact < w
    })
  }

  test("NDCG discount table: strictly decreasing, ≤ 10⁶; prefix sums strictly increasing") {
    check(Prop.forAll(Gen.chooseNum(2, 50)) { k =>
      val d = graft.operators.Retrieval.dcgDiscountsMicro(k)
      val pre = d.scanLeft(0L)(_ + _)
      d.head == 1000000L &&
        d.zip(d.tail).forall { case (a, b) => a > b } &&
        d.forall(x => x > 0 && x <= 1000000L) &&
        pre.zip(pre.tail).forall { case (a, b) => a < b }
    })
  }

  test("streaming-HLL estimate is a pure function of the register multiset and max-monotone") {
    import graft.streaming.HllStream.estimateScalar
    val regsGen = Gen.containerOfN[Array, Int](
      graft.functions.HyperLogLog.M, Gen.chooseNum(0, 23))
    check(Prop.forAll(regsGen, Gen.chooseNum(0L, Long.MaxValue)) { (regs, seed) =>
      // order-free sum: shuffling register POSITIONS changes the
      // estimate only through which j each rho lands in — but the
      // SUM itself is position-free, so a permutation fixes est
      val r = new scala.util.Random(seed)
      val perm = r.shuffle(regs.toList).toArray
      val permInvariant = estimateScalar(perm) == estimateScalar(regs.sorted)
      // monotone under register-wise max with any other state
      val other = Array.fill(regs.length)(r.nextInt(24))
      val merged = regs.zip(other).map { case (a, b) => math.max(a, b) }
      permInvariant && estimateScalar(merged) >= estimateScalar(regs) - 1e-4
    })
  }

  test("truncated-Poisson CDF thresholds strictly increase inside (0, 1)") {
    val f = math.exp(-1.0)
    val cdf = Seq(f, 2.0 * f, 2.5 * f, f * (1.0 + 1.0 + 0.5 + 1.0 / 6.0))
    assert(cdf.zip(cdf.tail).forall { case (a, b) => a < b })
    assert(cdf.head > 0.0 && cdf.last < 1.0)
    // and the literal round-trip the oracle relies on: toString
    // re-parses to the identical double
    cdf.foreach(x => assert(java.lang.Double.parseDouble(x.toString) == x))
  }
}
