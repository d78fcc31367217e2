package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Kaplan–Meier estimator (operators.Survival): hand-computed curve
  * (risk sets, censoring split, fixed-point survival), layout
  * invariance, and the all-censored degenerate case.
  */
class SurvivalSpec extends SparkSpec {

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")

  /** u1 churns at duration 10, u4 at 0; u2 (span 30) and u3 (last
    * event 2 days before the horizon) are censored.
    */
  private def fixture: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ts(0)), (1L, ts(10)),
      (2L, ts(0)), (2L, ts(15)), (2L, ts(30)),
      (3L, ts(5)), (3L, ts(28)),
      (4L, ts(2))
    ).toDF("user_id", "ts")
  }

  test("hand-computed curve: risk sets, d/c split, survival milli") {
    import spark.implicits._
    val out = Survival.kaplanMeier(fixture, "user_id", "ts")
      .select($"t_day", $"n_risk", $"d", $"c", $"lnq_cum", $"surv_milli")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // ln(3/4)→-2877, ln(2/3)→-4055 (r4-floored at +0.5), cum -6932
    assert(out == Seq(
      (0L, 4L, 1L, 0L, -2877L, 750L),
      (10L, 3L, 1L, 0L, -6932L, 500L),
      (23L, 2L, 0L, 1L, -6932L, 500L),
      (30L, 1L, 0L, 1L, -6932L, 500L)),
      s"got $out")
  }

  test("curve is identical across partition layouts") {
    import spark.implicits._
    def run(df: DataFrame) =
      Survival.kaplanMeier(df, "user_id", "ts")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(run(fixture.repartition(1)) == run(fixture.repartition(7)))
  }

  test("everyone censored: survival stays at 1000") {
    import spark.implicits._
    val df = Seq((1L, ts(29)), (2L, ts(30))).toDF("user_id", "ts")
    val out = Survival.kaplanMeier(df, "user_id", "ts")
      .select($"surv_milli").as[Long].collect().toSeq
    assert(out.forall(_ == 1000L), s"no observed deaths → S≡1; got $out")
  }

  test("logRank: mirror-symmetric groups score χ² = 0") {
    import spark.implicits._
    // even/odd users with IDENTICAL lifetime multisets: churn at 0
    // and 10, one censored straggler each — O1 must equal E1 exactly
    val rows = Seq(
      (1L, ts(0)), (1L, ts(10)),      // odd: churn at 10
      (2L, ts(0)), (2L, ts(10)),      // even: churn at 10
      (3L, ts(2)),                    // odd: churn at 0
      (4L, ts(2)),                    // even: churn at 0
      (5L, ts(0)), (5L, ts(30)),      // odd: censored
      (6L, ts(0)), (6L, ts(30)))      // even: censored
      .toDF("user_id", "ts")
    val r = Survival.logRank(rows, "user_id", "ts").head()
    assert(r.getAs[Long]("n1_users") === 3L)
    assert(r.getAs[Long]("n0_users") === 3L)
    // symmetric groups: every per-time term is d/2 with n1/n = 1/2
    // exactly representable, so E1 equals O1 with zero quantization
    assert(r.getAs[Long]("e1_milli") === r.getAs[Long]("o1") * 1000)
    assert(r.getAs[Long]("chi2_micro") <= 1L, s"χ² must be ~0: $r")
  }

  test("logRank: one group churning, the other censored, scores a large χ²") {
    import spark.implicits._
    // odd users all churn early; even users all survive to the horizon
    val rows = (1L to 9L by 2).flatMap(u => Seq((u, ts(0)), (u, ts(1)))) ++
      (2L to 10L by 2).flatMap(u => Seq((u, ts(0)), (u, ts(30))))
    val r = Survival.logRank(rows.toDF("user_id", "ts"), "user_id", "ts").head()
    assert(r.getAs[Long]("o1") === 5L)
    assert(r.getAs[Long]("chi2_micro") > 1000000L,
      s"divergent groups must score χ² > 1: $r")
  }

  test("logRank is layout invariant (quantized order-free sums)") {
    import spark.implicits._
    val rows = (1L to 40L).flatMap(u =>
      Seq((u, ts((u % 7).toInt)), (u, ts((u % 23).toInt + 5))))
    def run(parts: Int) = Survival.logRank(
      rows.toDF("user_id", "ts").repartition(parts), "user_id", "ts")
      .collect().toSeq
    assert(run(1) === run(13))
  }
}
