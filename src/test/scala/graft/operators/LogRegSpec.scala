package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point GD classifier (operators.LogReg): planted-separable
  * recovery, layout invariance (the exact-integer contract), integer
  * class rebalancing on skewed data, fdiv floor semantics, and the
  * split-eval composition.
  */
class LogRegSpec extends SparkSpec {

  private val dim = 8

  /** Deterministic separable corpus: y = [v_0 > v_1] with a wide
    * margin; multiplicative-hash jitter, no RNG (SURVEY §7.4).
    */
  private def planted(n: Int, posEvery: Int = 2): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      val pos = i % posEvery == 0
      val v = Array.tabulate(dim) { j =>
        val jitter = (((i * 2654435761L + j * 40503L) % 1000L) / 10000.0f)
        if (j == 0) (if (pos) 0.8f else -0.8f) + jitter else jitter
      }
      (i, v, if (pos) 1 else 0)
    }.toDF("id", "vec", "y")
  }

  test("separable data is classified perfectly after training") {
    val df = planted(400)
    val model = LogReg.train(df, "vec", "y", iterations = 8, etaDen = 2L)
    val scored = LogReg.scoreAll(df, "id", "vec", "y", model)
    assert(scored.filter(col("pred") =!= col("y")).count() == 0L,
      "a wide-margin linear problem must be solved exactly")
    // scores live on the fixed-point scale and saturate at the clamp
    val range = scored.agg(min("score"), max("score")).first()
    assert(range.getLong(0) >= 0L && range.getLong(1) <= LogReg.FeatScale)
  }

  test("training is bit-identical across partition layouts") {
    val df = planted(300)
    val m1 = LogReg.train(df.repartition(1), "vec", "y", 6, 2L, 3L)
    val m7 = LogReg.train(df.repartition(7), "vec", "y", 6, 2L, 3L)
    assert(m1.w.toSeq == m7.w.toSeq,
      "integer gradient sums must commute across layouts")
  }

  test("integer class weighting recovers a skewed minority") {
    // 1 positive in 10; the ×9 error weight must keep recall at 1.0
    // where the unweighted trainer drowns the minority class
    val df = planted(400, posEvery = 10)
    val weighted = LogReg.train(df, "vec", "y", 8, 2L, posWeight = 9L)
    val scored = LogReg.scoreAll(df, "id", "vec", "y", weighted)
    val pos = scored.filter(col("y") === 1)
    assert(pos.filter(col("pred") === 1).count() == pos.count(),
      "class-weighted training must recover the separable minority")
  }

  test("fdiv floors like the oracle's double division") {
    assert(LogReg.fdiv(7L, 2L) == 3L)
    assert(LogReg.fdiv(-7L, 2L) == -4L) // floor, not truncation
    assert(LogReg.fdiv(-8L, 2L) == -4L)
    assert(LogReg.fdiv(0L, 5L) == 0L)
  }

  test("quantize floors components and appends the bias feature") {
    val x = LogReg.quantize(Array(0.5f, -0.5f, 0.0f))
    assert(x.toSeq == Seq(512L, -512L, 0L, LogReg.FeatScale))
  }

  test("splitEval partitions rows and counts the holdout exactly") {
    val df = planted(400)
    val row = LogReg.splitEval(df, "id", "vec", "y",
      iterations = 8, etaDen = 2L, posWeight = 1L,
      trainFraction = 0.8, salt = 11L).first()
    val total = row.getLong(0) + row.getLong(1) + row.getLong(2) + row.getLong(3)
    val holdout = df.filter(Sampling.hashFraction(col("id"), 11L) >= 0.8).count()
    assert(total == holdout, "confusion matrix must cover exactly the holdout")
    assert(row.getLong(4) >= 900L, // separable → near-perfect holdout accuracy
      s"holdout acc_milli ${row.getLong(4)} unexpectedly low on separable data")
  }

  test("zero iterations yields the zero model and midpoint scores") {
    val df = planted(50)
    val model = LogReg.train(df, "vec", "y", iterations = 0)
    assert(model.w.forall(_ == 0L))
    val scored = LogReg.scoreAll(df, "id", "vec", "y", model)
    // margin 0 → score = FeatScale/2, pred = 1 (z >= 0)
    assert(scored.agg(min("score"), max("score")).first().toSeq ==
      Seq(LogReg.FeatScale / 2, LogReg.FeatScale / 2))
  }
}
