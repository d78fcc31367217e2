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

  test("nelsonAalen: hand-computed hazard increments and FH survival") {
    import spark.implicits._
    val out = Survival.nelsonAalen(fixture, "user_id", "ts")
      .select($"t_day", $"n_risk", $"h_micro", $"hazard_cum_micro",
        $"fh_surv_milli")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // h = fdiv(1e6·d, n): 1/4 → 250000, 1/3 → 333333, then censored
    // zeros; exp(−0.25)·1000 → 779, exp(−0.583333)·1000 → 558
    assert(out == Seq(
      (0L, 4L, 250000L, 250000L, 779L),
      (10L, 3L, 333333L, 583333L, 558L),
      (23L, 2L, 0L, 583333L, 558L),
      (30L, 1L, 0L, 583333L, 558L)),
      s"got $out")
  }

  test("coxBinary: early-churning odd cohort gets HR > 1 with a finite se") {
    import spark.implicits._
    // odd users churn at days 2/3/4; even users churn at 20/22/24;
    // u7 (odd) and u8 (even) are horizon-censored at duration 10
    def td(day: Int): Timestamp = Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong).atTime(12, 0))
    val rows = Seq(
      (1L, td(0)), (1L, td(2)),
      (3L, td(0)), (3L, td(3)),
      (5L, td(0)), (5L, td(4)),
      (2L, td(0)), (2L, td(20)),
      (4L, td(0)), (4L, td(22)),
      (6L, td(0)), (6L, td(24)),
      (7L, td(30)), (7L, td(40)),
      (8L, td(30)), (8L, td(40))).toDF("user_id", "ts")
    val r = Survival.coxBinary(rows, "user_id", "ts").head()
    assert(r.getAs[Long]("n1_users") == 4L && r.getAs[Long]("n0_users") == 4L)
    assert(r.getAs[Long]("o1") == 3L)
    assert(r.getAs[Long]("beta_micro") > 0L, s"got $r")
    assert(r.getAs[Long]("hr_micro") > 1000000L, s"got $r")
    assert(r.getAs[Long]("se_micro") > 0L, s"got $r")
  }

  test("coxBinary: fully-censored corpus yields NULL effect columns") {
    import spark.implicits._
    val df = Seq((1L, ts(29)), (2L, ts(30))).toDF("user_id", "ts")
    val r = Survival.coxBinary(df, "user_id", "ts").head()
    assert(r.isNullAt(r.fieldIndex("o1")) &&
      r.isNullAt(r.fieldIndex("beta_micro")) &&
      r.isNullAt(r.fieldIndex("hr_micro")) &&
      r.isNullAt(r.fieldIndex("se_micro")), s"got $r")
  }

  test("coxBinary is layout invariant") {
    import spark.implicits._
    val rows = (1L to 40L).flatMap(u =>
      Seq((u, ts((u % 7).toInt)), (u, ts((u % 23).toInt + 5))))
    def run(parts: Int) = Survival.coxBinary(
      rows.toDF("user_id", "ts").repartition(parts), "user_id", "ts")
      .collect().toSeq
    assert(run(1) === run(13))
  }
}
