package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property invariants for the round-9-continuation scalar cores —
  * pure arithmetic checked WITHOUT Spark (the distributed plumbing is
  * covered by the operator specs and oracles):
  *  - Jaro–Winkler: symmetric, bounded in [0, 1], identity ⇔ 1 on
  *    non-empty strings, and the prefix boost never exceeds the
  *    4·0.1 cap over the raw Jaro value;
  *  - the SPRT walk: the first-crossing index reported by a linear
  *    fold equals the minimal n with |step·(2S_n − n)| ≥ threshold —
  *    the definition the batch operator computes via prefix sums and
  *    the stream via per-row state.
  */
class Round9bPropertiesSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)

  test("Jaro–Winkler: symmetric, in [0,1], identity ⇔ 1 (non-empty)") {
    check(Prop.forAll(word, word) { (a, b) =>
      val ab = graft.functions.JaroWinklerAlgo.sim(a, b)
      val ba = graft.functions.JaroWinklerAlgo.sim(b, a)
      ab == ba && ab >= 0.0 && ab <= 1.0 &&
        ((ab == 1.0) == (a == b))
    })
  }

  test("Jaro–Winkler: adjacent transposition scores exactly the closed form") {
    // swapping two ADJACENT distinct chars of a length-m word (m ≥ 4,
    // so the matching window covers distance 1) leaves all m chars
    // matched with exactly one transposition pair:
    //   jaro = 1 − 1/(3m),  jw = jaro + min(i, 4)·0.1·(1 − jaro)
    // where i = the swap position = the common prefix length
    val cases = for {
      w <- Gen.choose(4, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      i <- Gen.choose(0, w.length - 2)
    } yield (w.mkString, i)
    check(Prop.forAll(cases) { case (w, i) =>
      if (w(i) == w(i + 1)) {
        graft.functions.JaroWinklerAlgo.sim(w, w) == 1.0   // swap is a no-op
      } else {
        val swapped = w.updated(i, w(i + 1)).updated(i + 1, w(i))
        val m = w.length
        val jaro = (m.toDouble / m + m.toDouble / m +
          (m - 1).toDouble / m) / 3.0
        val want = jaro + math.min(i, 4) * 0.1 * (1.0 - jaro)
        graft.functions.JaroWinklerAlgo.sim(w, swapped) == want
      }
    })
  }

  test("SPRT: fold-reported first crossing = minimal n with |llr| ≥ threshold") {
    val trials = Gen.choose(1, 80)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(true, false)))
    check(Prop.forAll(trials) { ts =>
      val step = graft.operators.Sprt.LlrStepMicro
      val thr = graft.operators.Sprt.ThresholdMicro
      // linear fold with freezing (the SprtStream recurrence)
      var llr = 0L; var n = 0L; var frozen = false
      var fN = 0L; var fLlr = 0L
      ts.foreach { s =>
        if (!frozen) {
          llr += (if (s) step else -step); n += 1
          if (math.abs(llr) >= thr) { frozen = true; fN = n; fLlr = llr }
        }
      }
      // closed-form walk (the batch operator's prefix formula)
      val prefix = ts.scanLeft(0L)((acc, s) => acc + (if (s) 1L else 0L)).tail
      val closed = prefix.zipWithIndex.map { case (sc, i) =>
        (i + 1L, step * (2 * sc - (i + 1L)))
      }
      val firstCross = closed.find { case (_, l) => math.abs(l) >= thr }
      if (frozen) firstCross.contains((fN, fLlr))
      else firstCross.isEmpty && llr == closed.last._2
    })
  }
}
