package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over an event stream — the
  * churn-analysis primitive (time-to-last-activity with right
  * censoring for still-active users), computed without ever forming
  * per-user state beyond one aggregation.
  *
  * Reference seam: the reference pipeline has no lifecycle analytics;
  * retention/churn curves are the LLM-data-ops extension next to q98
  * cohort retention (SURVEY §2.12).
  *
  * Semantics: each user's duration is days from first to last event;
  * a user whose last event falls within [[CensorDays]] of the global
  * observation end is right-CENSORED (still active — their true
  * lifetime exceeds what we saw), otherwise the churn event is
  * observed. The estimator over distinct durations t:
  *   n_t = Σ_{u ≥ t} users_u   (risk set — reverse running sum),
  *   S(t) = Π_{u ≤ t} (n_u − d_u)/n_u.
  *
  * Exactness (the q96/q164 libm discipline): every KM factor is the
  * exact rational (n−d)/n whose DOUBLE image is IEEE-identical across
  * engines; its ONE ln is snapped to r4 fixed point immediately, so
  * the cumulative log-survival is exact BIGINT algebra; the final
  * exp(·) is one libm call snapped to milli. A d = n time point (no
  * survivors) would make the factor ln(0); it can only be the LAST
  * point, carries lnq NULL (skipped by the running sum, matching SQL
  * SUM-over-NULL), and reports surv_milli = 0 explicitly.
  *
  * Scale shape: one groupBy(user) pass, one groupBy(duration) pass —
  * after which the frame is AT MOST one row per distinct duration-day
  * (bounded by the observation span, not the corpus). Both running
  * sums use [[GlobalOrder.runningSum]] (two-pass range-partitioned
  * prefix sum — no single-partition window ever appears in the plan).
  */
object Survival {

  /** r4 fixed point for per-factor logs. */
  val LnScale = 10000L

  /** Last-activity slack (days) before a user counts as churned. */
  val CensorDays = 14

  /** Shared churn lifetable: (t, d, c, n_risk) per distinct duration
    * — the spans → lifetimes → duration-grouped → reverse-running-sum
    * pipeline both estimators ([[kaplanMeier]], [[nelsonAalen]]) read.
    */
  private def lifetable(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val spans = events
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("fd"), max(to_date(col(tsCol))).as("ld"))
      .transform(graft.operators.Iterate.truncate) // horizon + lifetimes read it; scan events once
    val endd = spans.agg(max(col("ld"))).head.getDate(0)
    val lif = spans
      .select(
        datediff(col("ld"), col("fd")).cast("long").as("t"),
        when(datediff(lit(endd), col("ld")) > CensorDays, 1L).otherwise(0L)
          .as("ev"))
    val byT = lif.groupBy(col("t"))
      .agg(sum(col("ev")).as("d"),
        (count(lit(1)) - sum(col("ev"))).as("c"))

    // risk set: reverse (descending-t) running sum of the day's users
    GlobalOrder
      .runningSum(
        byT.withColumn("users_dec", (col("d") + col("c")).cast("decimal(38,0)")),
        Seq(col("t").desc), "users_dec", "n_risk_dec")
      .withColumn("n_risk", col("n_risk_dec").cast("long"))
      .drop("users_dec", "n_risk_dec")
  }

  /** KM curve: (t_day, n_risk, d, c, lnq_cum, surv_milli), one row
    * per distinct duration, ordered by t_day.
    */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val withRisk = lifetable(events, userCol, tsCol)

    // per-time factor ln((n-d)/n), r4-snapped; NULL at a no-survivor
    // tail point (handled via surv_milli = 0 below)
    val withLnq = withRisk.withColumn("lnq",
      when(col("d") < col("n_risk"),
        floor(log((col("n_risk") - col("d")).cast("double")
            / col("n_risk").cast("double")) * LnScale + lit(0.5))
          .cast("decimal(38,0)"))
        .otherwise(lit(null).cast("decimal(38,0)")))

    GlobalOrder
      .runningSum(withLnq, Seq(col("t").asc), "lnq", "lnq_cum_dec")
      .select(
        col("t").as("t_day"), col("n_risk"), col("d"), col("c"),
        col("lnq_cum_dec").cast("long").as("lnq_cum"),
        when(col("d") === col("n_risk"), 0L)
          .otherwise(floor(
            exp(col("lnq_cum_dec").cast("double") / lit(10000.0)) * 1000
              + lit(0.5)).cast("long"))
          .as("surv_milli"))
      .orderBy(col("t_day"))
  }

  /** Nelson–Aalen cumulative hazard over the same churn lifetable as
    * [[kaplanMeier]]: H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ, plus the
    * Fleming–Harrington survival S̃(t) = exp(−H(t)) — the estimator
    * pair survival texts recommend over KM for small risk sets.
    *
    * Exactness: each increment is fdiv(dᵢ·1e6, nᵢ) — EXACT integer
    * algebra (no libm at all until the final exp), so the cumulative
    * hazard is an order-free BIGINT sum; the one exp per row is
    * milli-snapped (the KM discipline). Returns
    * (t_day, n_risk, d, c, h_micro, hazard_cum_micro, fh_surv_milli),
    * ordered by t_day.
    */
  def nelsonAalen(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val withH = lifetable(events, userCol, tsCol)
      .withColumn("h_micro",
        expr("CAST(d AS BIGINT) * 1000000 DIV CAST(n_risk AS BIGINT)"))
    GlobalOrder
      .runningSum(
        withH.withColumn("h_dec", col("h_micro").cast("decimal(38,0)")),
        Seq(col("t").asc), "h_dec", "h_cum_dec")
      .select(
        col("t").as("t_day"), col("n_risk"), col("d"), col("c"),
        col("h_micro"),
        col("h_cum_dec").cast("long").as("hazard_cum_micro"),
        floor(exp(col("h_cum_dec").cast("double") / lit(-1000000.0)) * 1000
            + lit(0.5)).cast("long").as("fh_surv_milli"))
      .orderBy(col("t_day"))
  }

  /** 2^30 — the log-rank term quantum: per-time expectation and
    * variance terms are snapped to integer multiples of 2^-30 before
    * summation, so the sums are exact and order-free on both engines
    * (the q99 quantized-sum contract; raw double sums would drift
    * with accumulation order). */
  val LrQ = 1073741824L

  /** Two-group log-rank test (Mantel 1966; Peto & Peto 1972) over the
    * same churn lifetimes as [[kaplanMeier]]: users split by
    * `grpOf(user)` ∈ {0, 1}, H₀ = identical survival. At each
    * distinct duration t with dₜ observed churns:
    *   E₁ₜ = dₜ·n₁ₜ/nₜ,  Vₜ = dₜ·(n₁ₜ/nₜ)·(n₀ₜ/nₜ)·(nₜ−dₜ)/(nₜ−1),
    * χ² = (O₁ − ΣE₁)² / ΣV. Each term is ONE fixed double expression
    * (identical text both engines) floor-snapped to 2^-30 before the
    * exact BIGINT sum; only the final χ² division is a double.
    * Returns one row: (n1_users, n0_users, o1, e1_milli, v_milli,
    * chi2_micro).
    *
    * Scale shape: same as [[kaplanMeier]] — one user pass, one
    * duration pass, then distinct-duration-sized frames; the two
    * per-group risk sets are reverse [[GlobalOrder.runningSum]]s
    * (range-partitioned two-pass, no single-partition window).
    */
  /** Shared two-group lifetable: (lif = per-user (grp, t, ev),
    * risk = per-duration (t, d1, d0, n1, n0)) — the spans →
    * lifetimes → duration-grouped → per-group reverse-running-sum
    * pipeline [[logRank]] and [[coxBinary]] both read.
    */
  private def twoGroupRisk(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      grpOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (DataFrame, DataFrame) = {
    val spans = events
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("fd"), max(to_date(col(tsCol))).as("ld"))
      .withColumn("grp", grpOf(col(userCol)).cast("long"))
      .transform(graft.operators.Iterate.truncate)
    val endd = spans.agg(max(col("ld"))).head.getDate(0)
    val lif = spans.select(col("grp"),
      datediff(col("ld"), col("fd")).cast("long").as("t"),
      when(datediff(lit(endd), col("ld")) > CensorDays, 1L).otherwise(0L)
        .as("ev"))
    val byT = lif.groupBy(col("t")).agg(
      sum(when(col("grp") === 1, col("ev")).otherwise(0L)).as("d1"),
      sum(when(col("grp") === 0, col("ev")).otherwise(0L)).as("d0"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("u1"),
      sum(when(col("grp") === 0, 1L).otherwise(0L)).as("u0"))
    val withDec = byT
      .withColumn("u1d", col("u1").cast("decimal(38,0)"))
      .withColumn("u0d", col("u0").cast("decimal(38,0)"))
    val risk = GlobalOrder.runningSum(
      GlobalOrder.runningSum(withDec, Seq(col("t").desc), "u1d", "n1d"),
      Seq(col("t").desc), "u0d", "n0d")
      .select(col("t"), col("d1"), col("d0"),
        col("n1d").cast("long").as("n1"), col("n0d").cast("long").as("n0"))
    (lif, risk)
  }

  def logRank(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      grpOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => pmod(c, lit(2))): DataFrame = {
    val (lif, risk) = twoGroupRisk(events, userCol, tsCol, grpOf)
    val terms = risk
      .withColumn("d", col("d1") + col("d0"))
      .withColumn("n", col("n1") + col("n0"))
      .filter(col("d") > 0)
      .withColumn("e1q",
        floor(col("d").cast("double") * col("n1") / col("n") * LrQ)
          .cast("long"))
      .withColumn("vq", when(col("n") > 1,
        floor(col("d").cast("double") * col("n1") / col("n") * col("n0")
          / col("n") * (col("n") - col("d")) / (col("n") - 1) * LrQ)
          .cast("long")).otherwise(0L))
    val nByGrp = lif.groupBy(col("grp")).agg(count(lit(1)).as("nu"))
    val nWide = nByGrp.agg(
      sum(when(col("grp") === 1, col("nu")).otherwise(0L)).as("n1_users"),
      sum(when(col("grp") === 0, col("nu")).otherwise(0L)).as("n0_users"))
    val agg = terms.agg(sum(col("d1")).as("o1"), sum(col("e1q")).as("se"),
      sum(col("vq")).as("sv"))
    // χ² = (O₁·Q − ΣE₁q)² / (Q·ΣVq): the numerator difference is an
    // exact integer (< 2^53, so its double image is exact); one
    // double square and one double division end the computation
    val z = (col("o1") * LrQ - col("se")).cast("double")
    nWide.crossJoin(agg).select(
      col("n1_users"), col("n0_users"), col("o1"),
      expr(s"se * 1000 DIV $LrQ").as("e1_milli"),
      expr(s"sv * 1000 DIV $LrQ").as("v_milli"),
      floor(z * z / (col("sv").cast("double") * LrQ) * 1000000 + lit(0.5))
        .cast("long").as("chi2_micro"))
  }

  /** Cox proportional hazards with a single BINARY covariate (the
    * [[logRank]] cohorts), Breslow tie handling, Newton–Raphson on
    * the partial likelihood — the EFFECT-SIZE companion to q218:
    * log-rank says WHETHER the two churn curves differ, this
    * estimates by HOW MUCH (hazard ratio e^β with a standard error).
    *
    * With x ∈ {0,1} the per-duration score and information reduce to
    * risk-set counts: p_t = n1·e^β/(n0 + n1·e^β),
    *   U(β) = Σ_t (d1_t − d_t·p_t),  I(β) = Σ_t d_t·p_t·(1−p_t),
    * β ← β + U/I from β = 0.
    *
    * Replay discipline: β lives in exact micro units; each
    * iteration's e^β is ONE libm exp; every per-duration U/I term is
    * a single fixed double expression snapped to 2^−30 ([[LrQ]])
    * before the exact BIGINT sum (the q218 term treatment), and the
    * Newton step is one double division micro-snapped — so the whole
    * 3-iteration trajectory replays in unrolled oracle CTEs.
    *
    * Scale shape: the distributed part is the [[twoGroupRisk]]
    * lifetable (one user pass, one duration pass); the Newton loop
    * runs on the driver over the DURATION-bounded frame (grows with
    * the calendar, not the corpus — the q170 bounded-collect class).
    * Returns one row: (n1_users, n0_users, o1, beta_micro, hr_micro,
    * se_micro).
    */
  def coxBinary(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      grpOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => pmod(c, lit(2)),
      iterations: Int = 3): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val (lif, risk) = twoGroupRisk(events, userCol, tsCol, grpOf)
    val rows = risk.filter(col("d1") + col("d0") > 0)
      .select(col("d1"), col("d0"), col("n1"), col("n0"))
      .collect()
    var b = 0L
    for (_ <- 1 to iterations) {
      val eb = math.exp(b.toDouble / 1000000.0)
      var su = 0L
      var si = 0L
      rows.foreach { r =>
        val (d1, d0, n1, n0) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        val p = n1.toDouble * eb / (n0.toDouble + n1.toDouble * eb)
        su += math.floor((d1.toDouble - (d1 + d0).toDouble * p) * LrQ + 0.5)
          .toLong
        si += math.floor((d1 + d0).toDouble * p * (1.0 - p) * LrQ + 0.5)
          .toLong
      }
      if (si != 0L)
        b += math.floor(su.toDouble / si.toDouble * 1000000.0 + 0.5).toLong
    }
    // final information at the converged β for the standard error
    val ebF = math.exp(b.toDouble / 1000000.0)
    var siF = 0L
    var o1 = 0L
    rows.foreach { r =>
      val (d1, d0, n1, n0) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val p = n1.toDouble * ebF / (n0.toDouble + n1.toDouble * ebF)
      siF += math.floor((d1 + d0).toDouble * p * (1.0 - p) * LrQ + 0.5).toLong
      o1 += d1
    }
    val nByGrp = lif.groupBy(col("grp")).agg(count(lit(1)).as("nu"))
    val nWide = nByGrp.agg(
      sum(when(col("grp") === 1, col("nu")).otherwise(0L)).as("n1_users"),
      sum(when(col("grp") === 0, col("nu")).otherwise(0L)).as("n0_users"))
    // NULL-propagation parity with the SQL replay: a fully-censored
    // corpus (no observed events) yields NULL o1/β/HR/se exactly as
    // SUM-over-empty does in the oracle; a degenerate information
    // (siF = 0) NULLs only the standard error.
    val some = rows.nonEmpty
    val betaRow = Seq((
        if (some) Some(o1) else None,
        if (some) Some(b) else None,
        if (some) Some(math.floor(ebF * 1000000.0 + 0.5).toLong) else None,
        if (some && siF != 0L)
          Some(math.floor(1000000.0 / math.sqrt(siF.toDouble / LrQ) + 0.5)
            .toLong)
        else None))
      .toDF("o1", "beta_micro", "hr_micro", "se_micro")
    nWide.crossJoin(betaRow)
      .select(col("n1_users"), col("n0_users"), col("o1"),
        col("beta_micro"), col("hr_micro"), col("se_micro"))
  }

  /** Restricted mean survival time: RMST(τ) = ∫₀^τ S(t)dt for the
    * [[kaplanMeier]] step curve, one row per restriction horizon τ —
    * the "mean days survived within the first τ" summary survival
    * texts recommend over the (censoring-undefined) raw mean.
    *
    * Exactness: S is the KM step function (surv_milli exact after
    * its one snapped exp per point), so the integral is a PURE
    * integer sum of surv_milli · clipped-segment-length — zero
    * additional tolerance. Segment bounds come from a zipRank
    * self-join (no global window); the τ grid is a broadcast local
    * relation. Returns (tau, rmst_milli), rmst in milli-days.
    */
  def rmst(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      taus: Seq[Long]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val km = kaplanMeier(events, userCol, tsCol)
      .select(col("t_day").cast("long").as("t0"), col("surv_milli").as("sv"))
    val ranked = GlobalOrder.zipRank(km.sort(col("t0")), "rk")
      .transform(graft.operators.Iterate.truncate) // both sides of the shift join read it
    val nxt = ranked.select(col("rk").as("rk2"), col("t0").as("t1"))
    val segs = ranked
      .join(nxt, col("rk2") === col("rk") + 1L, "left")
      .select(col("t0"), col("t1"), col("sv"))
    val init = ranked.agg(min(col("t0")).as("t1"))
      .select(lit(0L).as("t0"), col("t1"), lit(1000L).as("sv"))
    val tauDf = taus.toDF("tau")
    segs.unionByName(init)
      .crossJoin(broadcast(tauDf))
      .groupBy(col("tau"))
      .agg(sum(col("sv") *
          (least(coalesce(col("t1"), col("tau")), col("tau"))
            - least(col("t0"), col("tau")))).as("rmst_milli"))
      .orderBy(col("tau"))
  }
}
