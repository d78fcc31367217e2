package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Linear QUANTILE regression by pinball-loss subgradient descent —
  * the conditional-quantile member of the supervised family: q194's
  * OLS fits the conditional MEAN, this fits the conditional τ-quantile
  * (e.g. the p90 premium-price curve), robust to the same tail the
  * mean is dragged by.
  *
  * Fixed-point discipline (the [[LogReg]] replay contract): with a
  * RATIONAL τ = posW/(posW+negW), the pinball subgradient is integer-
  * weighted sign algebra — a row contributes −posW (under-prediction,
  * r > 0), +negW (over), or 0 (exact) — so per-iteration gradient
  * sums are exact BIGINTs, order-free over any layout. Predictions
  * use the milli-slope convention ŷ = w0 + fdiv(w1·x, 1000); the only
  * divisions anywhere are [[LogReg.fdiv]] (floor of an IEEE double
  * quotient, operands < 2^53 — see headroom), mirrored verbatim by
  * the oracle's floor(CAST(a AS DOUBLE)/b).
  *
  * Scale shape: one distributed 4-scalar aggregation per iteration
  * (g0, g1, loss, n) with the current weights on the closure as
  * literals — the corpus never shuffles, the driver sees only
  * scalars (the [[GradientBoost]] candidate-scan shape, minus even
  * the candidate grid).
  *
  * Headroom: |g1| ≤ posW·n·max(x) ≈ 9·6e5·5e3 ≈ 2^45 at sf0.1 and
  * grows linearly with rows — the double-floored step g1·stepNum/n
  * keeps operands < 2^53 up to ~2^8× that; past it, switch the step
  * products to decimal(38,0) (the q267 rescale class).
  *
  * Returns one row per iteration: (round, w0, w1, loss_x10) with
  * loss_x10 = Σ max(τr, (τ−1)r)·(posW+negW) evaluated at the
  * PRE-update weights — the training curve the oracle replays.
  */
object QuantileReg {

  /** rows: (x, y) integer-quantized columns. posW/negW: integer
    * pinball weights, τ = posW/(posW+negW). */
  def fit(
      rows: DataFrame,
      xCol: String,
      yCol: String,
      posW: Long = 9L,
      negW: Long = 1L,
      iterations: Int = 4,
      stepW0: Long = 500L,
      stepW1: Long = 20L): Seq[(Long, Long, Long, Long)] = {
    require(posW > 0 && negW > 0, "positive pinball weights")
    val base = rows.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))

    var w0 = 0L
    var w1 = 0L
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    for (t <- 1 to iterations) {
      val pred = lit(w0) +
        floor((col("x") * lit(w1)).cast("double") / lit(1000.0)).cast("long")
      val r = col("y") - pred
      val u = when(r > 0, lit(-posW)).when(r < 0, lit(negW))
        .otherwise(lit(0L))
      val loss = when(r > 0, lit(posW) * r).otherwise(lit(-negW) * r)
      val agg: Row = base.agg(
        sum(u).as("g0"),
        sum(u * col("x")).as("g1"),
        sum(loss).as("lx"),
        count(lit(1)).as("n")).head()
      val (g0, g1, lx, n) =
        (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
      w0 = w0 - LogReg.fdiv(g0 * stepW0, n)
      w1 = w1 - LogReg.fdiv(g1 * stepW1, n)
      out += ((t.toLong, w0, w1, lx))
    }
    out.result()
  }
}
