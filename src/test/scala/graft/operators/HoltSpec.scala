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

  test("holtWinters: hand-computed first post-warm-up step (period 2)") {
    import spark.implicits._
    // warm-up x = (100, 140): l0 = fdiv(240,2) = 120, s = (-20, 20).
    // step x=130: s0 = -20, fitted = 120 + 0 - 20 = 100;
    // d = fdiv(130-120-0+20, 4) = 7; l = 127; b = fdiv(7,8) = 0;
    // sNew = -20 + fdiv(130-127+20, 4) = -15.
    // step x=180: s0 = 20, fitted = 127 + 0 + 20 = 147;
    // d = fdiv(180-127-0-20, 4) = 8; l = 135; b = 0 + fdiv(8,8) = 1;
    // s = 20 + fdiv(180-135-20, 4) = 26.
    val df = Seq((d(1), 100L), (d(2), 140L), (d(3), 130L), (d(4), 180L))
      .toDF("day", "xq")
    val out = Holt.holtWinters(df, "day", "xq", 4L, 8L, 4L, period = 2)
      .select($"xq", $"level", $"trend", $"s_used", $"fitted")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (130L, 127L, 0L, -20L, 100L),
      (180L, 135L, 1L, 20L, 147L)), s"got $out")
  }

  test("holtWinters is layout invariant and drops short series") {
    import spark.implicits._
    val df = (1 to 28).map(i =>
      (d(i), ((i * 2654435761L) % 5000L))).toDF("day", "xq")
    def run(x: DataFrame) =
      Holt.holtWinters(x, "day", "xq", 4L, 8L, 4L)
        .as[(Date, Long, Long, Long, Long, Long)].collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(7)))
    assert(run(df.limit(0)).isEmpty)
    val short = (1 to 5).map(i => (d(i), 100L)).toDF("day", "xq")
    assert(Holt.holtWinters(short, "day", "xq", 4L, 8L, 4L).count() == 0L)
  }
}
