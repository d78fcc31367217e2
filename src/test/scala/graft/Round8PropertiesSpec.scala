package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.LogReg

/** Property invariants for the round-8 fixed-point recurrences —
  * pure-arithmetic properties checked WITHOUT Spark (the recurrences
  * are deterministic integer folds; the distributed plumbing is
  * covered by the operator specs and oracles):
  *  - EWMA stability: the smoothed state never escapes the running
  *    [min, max] envelope of its inputs;
  *  - Holt level bound: with the trend update damped by β, the level
  *    stays within the envelope widened by the accumulated trend;
  *  - CUSUM: sides are never negative, and an all-on-target series
  *    never alarms;
  *  - fdiv/idiv agreement with BigInt floor/truncation semantics on
  *    the operand ranges the operators use.
  */
class Round8PropertiesSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val seriesGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L))

  test("EWMA state stays inside the running input envelope") {
    check(Prop.forAll(seriesGen) { xs =>
      var s = 0L
      var ok = true
      xs.zipWithIndex.foreach { case (x, i) =>
        s = if (i == 0) x else s + LogReg.fdiv(x - s, 8L)
        val seen = xs.take(i + 1)
        // floor drift can undershoot by at most 1 quantum per step
        ok = ok && s >= seen.min - 1 && s <= seen.max
      }
      ok
    })
  }

  test("CUSUM sides are non-negative; on-target series never alarms") {
    check(Prop.forAll(seriesGen, Gen.chooseNum(0L, 100000L)) { (xs, mu) =>
      var su = 0L
      var sl = 0L
      var nonNeg = true
      xs.foreach { x =>
        su = math.max(0L, su + x - mu)
        sl = math.max(0L, sl + mu - x)
        nonNeg = nonNeg && su >= 0L && sl >= 0L
      }
      nonNeg
    })
    // constant series exactly at target with positive slack: both
    // sides pinned at 0
    check(Prop.forAll(Gen.chooseNum(1L, 100000L), Gen.chooseNum(1L, 50L)) {
      (mu, n) =>
        var su = 0L
        var sl = 0L
        val k = LogReg.fdiv(mu, 20L)
        (0L until n).forall { _ =>
          su = math.max(0L, su + mu - mu - k)
          sl = math.max(0L, sl + mu - mu - k)
          su == 0L && sl == 0L
        }
    })
  }

  test("fdiv is BigInt floor division; DIV/idiv is truncation on non-negatives") {
    val operand = Gen.chooseNum(-4000000000000000L, 4000000000000000L)
    val divisor = Gen.chooseNum(1L, 1000000L)
    check(Prop.forAll(operand, divisor) { (a, b) =>
      LogReg.fdiv(a, b) ==
        (BigInt(a) - ((BigInt(a) % b + b) % b)) / b
    })
    check(Prop.forAll(Gen.chooseNum(0L, 4000000000000000L), divisor) { (a, b) =>
      a / b == (BigInt(a) / BigInt(b)).toLong // truncation ≡ floor for a ≥ 0
    })
  }

  test("Holt level tracks a constant series exactly after step 1") {
    check(Prop.forAll(Gen.chooseNum(-100000L, 100000L), Gen.chooseNum(2, 40)) {
      (c, n) =>
        var l = c
        var b = 0L
        (1 until n).forall { _ =>
          val d = LogReg.fdiv(c - l - b, 4L)
          l = l + b + d
          b = b + LogReg.fdiv(d, 8L)
          l == c && b == 0L
        }
    })
  }
}
