package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property invariants for the round-11 late-wave members — pure
  * arithmetic, no Spark (the distributed plumbing is covered by the
  * operator specs and oracles):
  *  - RMST step integral: bounded by the horizon, monotone in τ, and
  *    equal to a per-day reference summation for arbitrary step
  *    curves;
  *  - average precision: ppm-bounded, and exactly 10⁶ on an
  *    all-relevant prefix with enough positives;
  *  - simple-regression leverage: hₜ ∈ (0, 1] and Σhₜ = 2 (the
  *    two-parameter hat-matrix trace) — the identities q340's Cook
  *    chain relies on;
  *  - levenshtein length-band soundness: edit distance never
  *    undercuts |Δlen| — the implication InferLevenshteinBand
  *    injects;
  *  - ACF micro quantization: |rₖ| ≤ 1 (Cauchy–Schwarz survives the
  *    sign-split integer division) for arbitrary centered series.
  */
class Round11cPropertiesSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  /** Scalar replica of the q312 segment integral. */
  private def rmstRef(curve: Seq[(Long, Long)], tau: Long): Long = {
    // curve: (t ascending, surv_milli); S = 1000 before the first t
    val ts = curve.map(_._1)
    val segs = (0L, ts.headOption.getOrElse(0L), 1000L) +:
      curve.zipWithIndex.map { case ((t, sv), i) =>
        val t1 = if (i + 1 < curve.length) curve(i + 1)._1 else tau
        (t, t1, sv)
      }
    segs.map { case (t0, t1, sv) =>
      sv * (math.min(Option(t1).getOrElse(tau), tau)
        - math.min(t0, tau)) max 0L
    }.sum
  }

  test("rmst: bounded by 1000·τ, monotone in τ, equals per-day scan") {
    val curveGen = for {
      n <- Gen.chooseNum(1, 12)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 60L)).map(_.distinct.sorted)
      svs <- Gen.listOfN(ts.length, Gen.chooseNum(0L, 1000L))
        .map(_.sorted.reverse) // survival is non-increasing
    } yield ts.zip(svs)
    val tauGen = Gen.chooseNum(1L, 90L)
    check(Prop.forAll(curveGen, tauGen) { (curve, tau) =>
      if (curve.isEmpty) true
      else {
        val v = rmstRef(curve, tau)
        // per-day scan reference: S(u) at integer u = sv of the last
        // t <= u, 1000 before the first
        val scan = (0L until tau).map { u =>
          curve.takeWhile(_._1 <= u).lastOption.map(_._2).getOrElse(1000L)
        }.sum
        v >= 0L && v <= 1000L * tau && v == scan &&
        rmstRef(curve, tau + 7) >= v
      }
    })
  }

  test("average precision ppm: bounded, and 1e6 on an all-hit prefix") {
    val relGen = Gen.listOfN(10, Gen.oneOf(0L, 1L))
    val extraGen = Gen.chooseNum(0L, 50L)
    check(Prop.forAll(relGen, extraGen) { (rel, extra) =>
      // n_rel counts ALL relevant docs, so it is >= the observed hits
      val nRel = math.max(1L, rel.sum + extra)
      var cnt = 0L
      val terms = rel.zipWithIndex.map { case (r, i) =>
        cnt += r
        if (r == 1L) cnt * 1000000L / (i + 1) else 0L
      }
      val ap = terms.sum / math.min(nRel, 10L)
      val apAllHit = {
        var c = 0L
        val t = (1 to 10).map { i => c += 1; c * 1000000L / i }.sum
        t / math.min(math.max(nRel, 10L), 10L)
      }
      ap >= 0L && ap <= 1000000L && apAllHit == 1000000L
    })
  }

  test("simple-regression leverage: h ∈ (0,1], Σh = 2") {
    val nGen = Gen.chooseNum(3, 200)
    check(Prop.forAll(nGen) { n =>
      val nd = n.toDouble
      val st = (1 to n).map(_.toLong).sum
      val stt = (1 to n).map(t => t.toLong * t).sum
      val tbar = st.toDouble / nd
      val sxx = stt.toDouble - st.toDouble * st.toDouble / nd
      val hs = (1 to n).map { t =>
        1.0 / nd + (t.toDouble - tbar) * (t.toDouble - tbar) / sxx
      }
      hs.forall(h => h > 0.0 && h <= 1.0) &&
      math.abs(hs.sum - 2.0) < 1e-9
    })
  }

  /** Scalar Levenshtein DP. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("levenshtein length-band soundness: lev(a,b) >= |len(a)-len(b)|") {
    val sGen = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
    check(Prop.forAll(sGen, sGen) { (a, b) =>
      lev(a, b) >= math.abs(a.length - b.length)
    })
  }

  test("ACF micro quantization: |r_k| <= 1e6 for any centered series") {
    val serGen = Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L))
      .suchThat(_.length >= 2)
    val kGen = Gen.chooseNum(1, 3)
    check(Prop.forAll(serGen, kGen) { (xs, k) =>
      val m = xs.sum / xs.length
      val c = xs.map(_ - m)
      val g0 = c.map(v => BigInt(v) * v).sum
      if (g0 == 0 || c.length <= k) true
      else {
        val gk = c.dropRight(k).zip(c.drop(k))
          .map { case (x, y) => BigInt(x) * y }.sum
        val rq =
          if (gk >= 0) (gk * 1000000L) / g0
          else -((-gk * 1000000L) / g0)
        rq.abs <= 1000000L
      }
    })
  }
}
