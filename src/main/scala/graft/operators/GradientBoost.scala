package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L2 gradient boosting over regression stumps (Friedman 2001) — the
  * REGRESSION member of the supervised family ([[LogReg]] GD
  * classification, [[AdaBoost]] additive classification,
  * [[DecisionTree]] greedy single tree): each round fits a depth-1
  * stump to the current residuals and subtracts half the leaf means
  * (shrinkage ν = 1/2), so the ensemble is an additive staircase.
  *
  * Exactness (the [[AdaBoost]] replay discipline): residuals are
  * exact integer cents throughout —
  *   - the split score is gain = S_L²/n_L + S_R²/n_R over residual
  *     sums; computed as ONE double chain (operands < 2^53) and
  *     round-half-up snapped to a 1e6 quantum (floor(x/1e6 + 0.5),
  *     mirrored verbatim in the oracle CTE) BEFORE the argmax, so the
  *     selection is an exact integer comparison with the
  *     deterministic tie-break (gain desc, dim, thr);
  *   - leaf means are fdiv(S, n), the applied update
  *     fdiv(fdiv(S, n), 2) — truncating integer arithmetic mirrored
  *     by floor-division in SQL;
  *   - residual updates are exact integer subtraction, so every
  *     round's state replays value-for-value in an unrolled CTE.
  * No libm at all (the one place [[AdaBoost]] needs ln, L2 boosting
  * needs only means).
  *
  * Scale shape per round: one distributed candidate aggregation
  * (grid-sized output: dims × thresholds, never corpus-sized), one
  * argmax row to the driver (bounded-collect class), one narrow
  * per-row residual map. The threshold grid is the per-dim decile
  * set, computed once.
  */
object GradientBoost {

  final case class Round(
      round: Int, dim: Int, thr: Long, nL: Long,
      gammaL: Long, gammaR: Long, gainCq: Long)

  /** Fit `iterations` stump rounds on integer feature columns
    * `dims` (xq1..xqK) with integer target column `target`, all in
    * `rows`. Returns the per-round model plus the post-round residual
    * sum-of-squares (1e6-quantized) for the training curve.
    */
  def fit(
      rows: DataFrame,
      dims: Seq[String],
      target: String,
      iterations: Int): Seq[(Round, Long)] = {
    require(iterations >= 1 && dims.nonEmpty)
    val spark = rows.sparkSession
    import spark.implicits._

    // per-dim decile threshold grid, computed ONCE on the raw
    // features (floor-snapped; duplicates collapse)
    val pcts = (1 to 9).map(_ / 10.0)
    val thrRows = rows.select(dims.zipWithIndex.map { case (c, i) =>
      percentile(col(c), typedLit(pcts)).as(s"q$i")
    }: _*).head()
    val grid: Seq[(Int, Long)] = dims.indices.flatMap { i =>
      thrRows.getAs[scala.collection.Seq[Double]](s"q$i")
        .map(v => (i, math.floor(v).toLong)).distinct
    }

    var state = rows.select(
      (dims.map(col) :+ col(target).cast("long").as("r")): _*)
      .transform(graft.operators.Iterate.truncate)
    val out = Seq.newBuilder[(Round, Long)]

    for (it <- 1 to iterations) {
      // distributed per-candidate aggregation: for each (dim, thr)
      // the left-side count and residual sum, plus totals
      val tot = state.agg(count(lit(1)).as("n"), sum($"r").as("s")).head()
      val (nAll, sAll) = (tot.getLong(0), tot.getLong(1))
      val candAggs = grid.zipWithIndex.flatMap { case ((dim, thr), gi) =>
        Seq(
          sum(when(col(dims(dim)) <= thr, 1L).otherwise(0L)).as(s"n$gi"),
          sum(when(col(dims(dim)) <= thr, $"r").otherwise(0L)).as(s"s$gi"))
      }
      val cand = state.agg(candAggs.head, candAggs.tail: _*).head()
      val best = grid.zipWithIndex.flatMap { case ((dim, thr), gi) =>
        val nL = cand.getLong(cand.fieldIndex(s"n$gi"))
        val sL = cand.getLong(cand.fieldIndex(s"s$gi"))
        val nR = nAll - nL
        val sR = sAll - sL
        if (nL == 0 || nR == 0) None
        else {
          val gainCq = math.floor(
            (sL.toDouble * sL.toDouble / nL.toDouble
              + sR.toDouble * sR.toDouble / nR.toDouble) / 1000000.0 + 0.5)
            .toLong
          Some((gainCq, dim, thr, nL, sL, nR, sR))
        }
      }.minBy { case (g, dim, thr, _, _, _, _) => (-g, dim, thr) }
      val (gainCq, dim, thr, nL, sL, nR, sR) = best
      val gammaL = LogReg.fdiv(LogReg.fdiv(sL, nL), 2L)
      val gammaR = LogReg.fdiv(LogReg.fdiv(sR, nR), 2L)

      state = state.withColumn("r",
          when(col(dims(dim)) <= thr, $"r" - gammaL)
            .otherwise($"r" - gammaR))
        .transform(graft.operators.Iterate.truncate)
      val sse = state
        .agg(sum(($"r" * $"r").cast("decimal(38,0)")).as("ss")).head()
        .getDecimal(0)
      val sseCq = sse.divideToIntegralValue(new java.math.BigDecimal(1000000L))
        .longValueExact()
      out += ((Round(it, dim, thr, nL, gammaL, gammaR, gainCq), sseCq))
    }
    out.result()
  }
}
