package graft.operators

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** CUSUM changepoint detection (operators.Cusum): hand-computed
  * two-sided trajectory with slack/threshold derived from the
  * in-sample mean, and layout invariance.
  */
class CusumSpec extends SparkSpec {

  private def d(day: Int): Date = Date.valueOf(f"2024-07-$day%02d")

  test("hand-computed two-sided trajectory and alarms") {
    import spark.implicits._
    // μ = fdiv(700,4) = 175, k = 8, h = 87
    val df = Seq((d(1), 100L), (d(2), 100L), (d(3), 400L), (d(4), 100L))
      .toDF("day", "xq")
    val out = Cusum.detect(df, "day", "xq")
      .select($"xq", $"su", $"sl", $"alarm")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (100L, 0L, 67L, false),
      (100L, 0L, 134L, true),
      (400L, 217L, 0L, true),
      (100L, 134L, 67L, true)), s"got $out")
  }

  test("detection is layout invariant") {
    import spark.implicits._
    val df = (1 to 25).map(i => (d(i), 100L + (i * 2654435761L) % 300L))
      .toDF("day", "xq")
    def run(x: DataFrame) =
      Cusum.detect(x, "day", "xq")
        .as[(Date, Long, Long, Long, Boolean)].collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(6)))
  }
}
