package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Integer EWMA (operators.Ewma): hand-computed recurrence including
  * the floored negative step, (ts, id) ordering with timestamp ties,
  * and layout invariance.
  */
class EwmaSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 10:$min%02d:00")

  test("hand-computed recurrence with negative floored step") {
    import spark.implicits._
    val df = Seq(
      (1L, 101L, ts(0), 8.00),
      (1L, 102L, ts(1), 16.00),
      (1L, 103L, ts(2), 0.00)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Ewma.ewma(df, "user_id", "ts", "event_id", "value")
      .select($"rn", $"xq", $"ewma").as[(Long, Long, Long)].collect().toSeq
    // s1=800; s2=800+fdiv(800,8)=900; s3=900+fdiv(-900,8)=900-113=787
    assert(out == Seq((1L, 800L, 800L), (2L, 1600L, 900L), (3L, 0L, 787L)),
      s"got $out")
  }

  test("timestamp ties break by event id; layout invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, 202L, ts(0), 4.00), // same ts — id orders 201 before 202
      (1L, 201L, ts(0), 8.00),
      (2L, 301L, ts(0), 1.00)
    ).toDF("user_id", "event_id", "ts", "value")
    def run(d: DataFrame) =
      Ewma.ewma(d, "user_id", "ts", "event_id", "value")
        .select($"user_id", $"rn", $"event_id", $"ewma")
        .as[(Long, Long, Long, Long)].collect().toSeq
    val out = run(df)
    // user 1: 800 then 800 + fdiv(400-800,8) = 800 + floor(-50) = 750
    assert(out == Seq(
      (1L, 1L, 201L, 800L), (1L, 2L, 202L, 750L), (2L, 1L, 301L, 100L)),
      s"got $out")
    assert(run(df.repartition(5)) == out)
  }
}
