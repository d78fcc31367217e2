package graft.operators

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Seasonal decomposition (operators.Seasonal): hand-computed trend/
  * seasonal/residual on a linear+alternating series, NULL edges and
  * never-interior weekdays, layout invariance.
  */
class SeasonalSpec extends SparkSpec {

  private def d(day: Int): Date = Date.valueOf(f"2024-06-$day%02d")

  /** x_t = 70·(t+1) + (t mod 2)·7 over 10 days from Sat 2024-06-01:
    * a centered-7 window holds 3 odd offsets around an odd t (trend
    * 70·(t+1)+3, detrended +4) and 4 around an even t (trend
    * 70·(t+1)+4, detrended −4); each interior weekday (Tue–Fri)
    * appears once → residuals are exactly 0.
    */
  private def fixture: DataFrame = {
    import spark.implicits._
    (0 until 10).map(t => (d(t + 1), 70L * (t + 1) + (t % 2) * 7L))
      .toDF("day", "xq")
  }

  test("hand-computed decomposition with NULL edges") {
    import spark.implicits._
    val out = Seasonal.decompose(fixture, "day", "xq")
      .select($"weekday", $"trend_q", $"seasonal_q", $"resid_q")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    val expected = (0 until 10).map { t =>
      val wd = ((5 + t) % 7 + 1).toLong // 2024-06-01 is Saturday (6)
      if (t >= 3 && t <= 6) {
        val bump = if (t % 2 == 1) 3L else 4L
        (wd, Some(70L * (t + 1) + bump),
          Some(if (t % 2 == 1) 4L else -4L), Some(0L))
      } else (wd, None, None, None)
    }
    assert(out == expected, s"got $out")
  }

  test("decomposition is layout invariant") {
    import spark.implicits._
    def run(df: DataFrame) =
      Seasonal.decompose(df, "day", "xq")
        .as[(Date, Long, Long, Option[Long], Option[Long], Option[Long])]
        .collect().toSeq
    assert(run(fixture.repartition(1)) == run(fixture.repartition(5)))
  }
}
