package graft.operators

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Local-level Kalman filter over a day-keyed series — the
  * state-space member of the SPC/trend family: [[Cusum]] alarms on
  * drift, [[Holt]] fits trend+level with fixed gains, the Kalman
  * filter LEARNS its gain from the noise model (gain starts high and
  * anneals to the steady state as the state estimate firms up).
  *
  * Model: yₜ = ℓₜ + ε (var R), ℓₜ = ℓₜ₋₁ + η (var Q). Fixed-point
  * recurrence (the replay discipline — no drifting doubles in state):
  *  - predict p⁺ = p + Q (exact);
  *  - gain kₜ = round(10⁶·p⁺/(p⁺+R)) — exact round-half-up integer
  *    division (operands positive, both engines identical);
  *  - level ℓ += round(kₜ·(yₜ−ℓ)/10⁶) — the one signed rounding,
  *    floor(CAST(v AS DOUBLE)/10⁶ + 0.5) with |v| < 2⁵³ (cents diff
  *    ~10⁸ × gain ≤ 10⁶ → ≤ 10¹⁴), identical cross-engine;
  *  - variance p ← round((10⁶−kₜ)·p⁺/10⁶) — exact integers.
  * The whole trajectory therefore replays as a recursive CTE
  * value-for-value (the q181 CUSUM pattern). Initialization:
  * ℓ₁ = y₁, p₁ = P0, k₁ = 0 (no correction on the first day).
  *
  * Scale shape: the input aggregation is distributed; the recurrence
  * folds one day-count-bounded task (the [[Holt]] class — state is
  * calendar-sized, never corpus-sized).
  *
  * Returns one row per day: (day, xq, level, resid, k_micro).
  */
object Kalman {

  val R = 1000000L        // observation-noise variance unit
  val Q = 100000L         // process-noise variance (R/10)
  val P0 = 1000000L       // prior level variance

  final case class KalmanRow(
      day: Date, xq: Long, level: Long, resid: Long, k_micro: Long)

  def localLevel(series: DataFrame, dayCol: String, valCol: String): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    series.select(col(dayCol).cast("date"), col(valCol).cast("long"))
      .as[(Date, Long)]
      .groupByKey(_ => true)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._1.getTime)
        var l = 0L
        var p = P0
        var first = true
        rows.iterator.map { case (day, y) =>
          if (first) {
            first = false; l = y
            KalmanRow(day, y, l, 0L, 0L)
          } else {
            // predict: p grows by Q, then correct with gain k
            val pPred = p + Q
            val k = (2L * pPred * 1000000L + (pPred + R)) / (2L * (pPred + R))
            l = l + math.floor((k * (y - l)).toDouble / 1000000.0 + 0.5).toLong
            p = (2L * (1000000L - k) * pPred + 1000000L) / (2L * 1000000L)
            KalmanRow(day, y, l, y - l, k)
          }
        }
      }(Encoders.product[KalmanRow])
      .toDF(dayCol, valCol, "level", "resid", "k_micro")
      .orderBy(col(dayCol))
  }
}
