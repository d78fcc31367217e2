package graft.operators

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Two-sided CUSUM changepoint detection over a daily series — the
  * classic SPC drift alarm ("did ingest volume shift, and when")
  * next to [[Ewma]] (smoothing) and [[Seasonal]] (decomposition),
  * in integer fixed point so the max(0, ·) recurrence replays as a
  * recursive CTE.
  *
  * With μ = fdiv(Σx, n) (the in-sample reference level),
  * slack k = fdiv(μ, [[SlackDen]]) and threshold h = fdiv(μ,
  * [[ThreshDen]]):
  *   su_t = max(0, su_{t−1} + x_t − μ − k)   (upward drift)
  *   sl_t = max(0, sl_{t−1} + μ − x_t − k)   (downward drift)
  * with su_0 = sl_0 = 0; a row alarms while either side exceeds h.
  * Every step is exact integer algebra ([[LogReg.fdiv]] floors
  * identically in both engines; max ≡ GREATEST).
  *
  * Scale shape: the daily aggregation is distributed; the fold runs
  * over the day-count-bounded frame in one executor task (the
  * [[Holt]] bounded-frame class).
  */
object Cusum {

  /** slack = μ/20 (5% of the reference level per step). */
  val SlackDen = 20L

  /** alarm threshold = μ/2. */
  val ThreshDen = 2L

  /** (day, xq, su, sl, alarm) per day, ordered by day. */
  def detect(series: DataFrame, dayCol: String, valCol: String): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    series.select(col(dayCol).cast("date"), col(valCol).cast("long"))
      .as[(Date, Long)]
      .groupByKey(_ => true)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._1.getTime)
        val n = rows.length.toLong
        val mu = LogReg.fdiv(rows.map(_._2).sum, n)
        val k = LogReg.fdiv(mu, SlackDen)
        val h = LogReg.fdiv(mu, ThreshDen)
        var su = 0L
        var sl = 0L
        rows.iterator.map { case (day, xq) =>
          su = math.max(0L, su + xq - mu - k)
          sl = math.max(0L, sl + mu - xq - k)
          (day, xq, su, sl, su > h || sl > h)
        }
      }(Encoders.tuple(Encoders.DATE, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaBoolean))
      .toDF(dayCol, valCol, "su", "sl", "alarm")
      .orderBy(col(dayCol))
  }
}
