package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Discrete AdaBoost (operators.AdaBoost): planted noisy-margin
  * recovery, the exact renormalization identity, layout invariance,
  * and the loud degenerate-stump guard.
  */
class AdaBoostSpec extends SparkSpec {

  /** Separable on dim 0 with 10% planted label noise (i % 10 == 0),
    * so every round's weighted error is strictly inside (0, W).
    */
  private def planted(n: Int, noisy: Boolean): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      val pos = i % 2 == 0
      val j = ((i * 2654435761L) % 80L) / 1000.0f
      val v = Array(if (pos) 0.5f + j else -0.5f - j, j, -j, j / 2)
      val clean = if (pos) 0 else 1
      val label = if (noisy && i % 10 == 0) 1 - clean else clean
      (i, v, label)
    }.toDF("vec_id", "embedding", "label")
  }

  test("boosted stumps track the planted margin through label noise") {
    import spark.implicits._
    val docs = planted(200, noisy = true)
    val m = AdaBoost.fit(docs, "vec_id", "embedding", "label", iterations = 3)
    assert(m.rounds.head.dim == 0, s"round 1 must pick the planted dim: $m")
    assert(m.rounds.forall(r => r.err > 0 && r.err < r.w))
    val out = AdaBoost.score(docs, "vec_id", "embedding", "label", m)
      .select($"y", $"pred").as[(Long, Long)].collect()
    val acc = out.count { case (y, p) => y == p }.toDouble / out.length
    assert(acc >= 0.89, s"boosting should recover all but the noise; acc=$acc")
  }

  test("renormalization keeps total weight within truncation slack of n*2^16") {
    val docs = planted(120, noisy = true)
    // re-run one round by hand via the public model: after each round
    // the invariant is structural — refit with 1..3 rounds and check
    // the recorded selection totals
    val m3 = AdaBoost.fit(docs, "vec_id", "embedding", "label", iterations = 3)
    val target = 120L * AdaBoost.WScale
    m3.rounds.foreach { r =>
      assert(r.w <= target && r.w > target - 240L,
        s"round saw total ${r.w}, want ($target - 2n, $target]")
    }
  }

  test("fit is layout invariant; perfect separation fails loudly") {
    val noisy = planted(140, noisy = true)
    val m1 = AdaBoost.fit(noisy.repartition(1), "vec_id", "embedding", "label", 3)
    val m7 = AdaBoost.fit(noisy.repartition(7), "vec_id", "embedding", "label", 3)
    assert(m1 == m7)
    val clean = planted(100, noisy = false)
    val e = intercept[IllegalArgumentException] {
      AdaBoost.fit(clean, "vec_id", "embedding", "label", iterations = 1)
    }
    assert(e.getMessage.contains("degenerate"))
  }
}
