package graft.operators

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Holt smoothing (operators.Holt): hand-computed two-state
  * recurrence including floored negative steps, and layout
  * invariance.
  */
class HoltSpec extends SparkSpec {

  private def d(day: Int): Date = Date.valueOf(f"2024-05-$day%02d")

  test("hand-computed level/trend trajectory with negative floored step") {
    import spark.implicits._
    val df = Seq((d(1), 100L), (d(2), 200L), (d(3), 100L))
      .toDF("day", "xq")
    val out = Holt.smooth(df, "day", "xq", alphaDen = 4L, betaDen = 8L)
      .select($"xq", $"level", $"trend", $"forecast")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // t1: l=100,b=0; t2: d=25 → l=125,b=3; t3: d=fdiv(-28,4)=-7 →
    // l=121, b=3+fdiv(-7,8)=2
    assert(out == Seq(
      (100L, 100L, 0L, 100L),
      (200L, 125L, 3L, 128L),
      (100L, 121L, 2L, 123L)), s"got $out")
  }

  test("smoothing is layout invariant") {
    import spark.implicits._
    val df = (1 to 28).map(i =>
      (d(i), ((i * 2654435761L) % 5000L))).toDF("day", "xq")
    def run(x: DataFrame) =
      Holt.smooth(x, "day", "xq", 4L, 8L)
        .as[(Date, Long, Long, Long, Long)].collect().toSeq.map(t => (t._2, t._3, t._4))
    assert(run(df.repartition(1)) == run(df.repartition(7)))
  }
}
