package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Financial-risk analytics over the daily revenue series — the
  * drawdown / tail-risk / market-sensitivity family the warehouse
  * layer (q178 Holt, q179 seasonal, q181 CUSUM) stops short of.
  * Exact-integer trajectories (operators.Risk), one IEEE chain per
  * genuine real division, every query oracle-checked.
  */
object RiskQueries {

  /** Daily revenue in exact cents — the shared series input (the
    * q178/q179/q181 aggregation, verbatim).
    */
  private def dailyCents(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .select(to_date($"o_orderdate").as("day"),
        floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("xq"))
  }

  private val dailySql =
    """ser AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS xq
      |  FROM orders GROUP BY 1)""".stripMargin

  /** Per-nation day-over-day deltas on the zero-filled nation×day
    * grid — the q266 alignment, verbatim (nation-PARTITIONED lag,
    * never a global window).
    */
  private def nationGrid(s: SparkSession, d: String) = {
    import s.implicits._
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", to_date($"o_orderdate").as("day"),
        floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy($"n_name", $"day").agg(sum($"cents").as("xq"))
      .transform(graft.operators.Iterate.truncate) // grid + distinct legs read it
    val days = rev.select($"day").distinct()
    val nats = rev.select($"n_name").distinct()
    (rev, broadcast(nats).crossJoin(days)
      .join(rev, Seq("n_name", "day"), "left")
      .withColumn("xq", coalesce($"xq", lit(0L))))
  }

  private def nationDeltas(s: SparkSession, d: String) = {
    import s.implicits._
    val (_, grid) = nationGrid(s, d)
    val w = Window.partitionBy($"n_name").orderBy($"day")
    grid.withColumn("dx", $"xq" - lag($"xq", 1).over(w))
      .filter($"dx".isNotNull)
  }

  /** Oracle CTE chain producing the same `dd(n_name, day, dx)` —
    * the q266 oracle text, verbatim. */
  private val nationDeltaSql =
    """rev AS (
      |  SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS xq
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT na.n_name, dy.day, COALESCE(r.xq, 0) AS xq
      |  FROM (SELECT DISTINCT n_name FROM rev) na
      |  CROSS JOIN (SELECT DISTINCT day FROM rev) dy
      |  LEFT JOIN rev r ON r.n_name = na.n_name AND r.day = dy.day),
      |dxc AS (
      |  SELECT n_name, day,
      |    xq - lag(xq) OVER (PARTITION BY n_name ORDER BY day) AS dx
      |  FROM grid),
      |dd AS (SELECT n_name, day, dx FROM dxc WHERE dx IS NOT NULL)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ----- q264: drawdown trajectory of cumulative daily revenue
    // (operators.Risk.drawdown) — running sum, running peak, and
    // peak−cum per day, all exact BIGINT cents; the oracle replays
    // the whole trajectory with two window functions. The series
    // fold runs in one day-count-bounded task (the Holt class); the
    // input aggregation is distributed.
    QueryDef(
      "q264_drawdown",
      (s, d) => graft.operators.Risk.drawdown(dailyCents(s, d), "day", "xq"),
      Some(s"""WITH $dailySql,
             |cm AS (
             |  SELECT day, xq,
             |    CAST(SUM(xq) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum
             |  FROM ser)
             |SELECT day, xq, cum,
             |  CAST(MAX(cum) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS peak,
             |  CAST(MAX(cum) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cum
             |    AS BIGINT) AS dd
             |FROM cm ORDER BY day""".stripMargin)),

    // ----- q265: historical VaR(5%) + expected shortfall of the
    // day-over-day revenue changes (operators.Risk.varEs) — deltas
    // exact BIGINT, VaR by the engine-identical quantile_cont
    // interpolation (q105 parity), ES as an exact tail sum / count.
    // The tail predicate compares against the UNSNAPPED quantile so
    // r4 snapping can never move a boundary delta across it.
    QueryDef(
      "q265_var_es",
      (s, d) => graft.operators.Risk.varEs(dailyCents(s, d), "day", "xq", 0.05),
      Some(s"""WITH $dailySql,
             |dl AS (
             |  SELECT day, xq - lag(xq) OVER (ORDER BY day) AS dx FROM ser),
             |dd AS (SELECT dx FROM dl WHERE dx IS NOT NULL),
             |q AS (SELECT quantile_cont(dx, 0.05) AS vr FROM dd),
             |tl AS (
             |  SELECT CAST(SUM(dx) AS BIGINT) AS ts, COUNT(*) AS tn
             |  FROM dd, q WHERE CAST(dx AS DOUBLE) <= vr)
             |SELECT (SELECT COUNT(*) FROM ser) AS n_days,
             |  floor(vr * 10000 + 0.5) / 10000 AS var_p,
             |  CAST(floor(CAST(ts AS DOUBLE) / tn * 1000000 + 0.5) AS BIGINT)
             |    AS es_micro,
             |  tn AS n_tail
             |FROM q, tl""".stripMargin)),

    // ----- q266: per-nation beta against the market plus Sharpe
    // ratio, over day-over-day changes of per-nation daily revenue.
    // A dense nation×day grid (zero-filled) aligns the series; the
    // delta lag is a NATION-partitioned window (never global); the
    // market delta is the per-day sum of nation deltas (no global
    // window needed); moments are exact BIGINT products summed in
    // decimal(38,0)/HUGEINT (q170 discipline); beta and Sharpe are
    // each ONE identical IEEE chain, micro-snapped.
    QueryDef(
      "q266_sharpe_beta",
      (s, d) => {
        import s.implicits._
        val rev = Tables.orders(s, d)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .select($"n_name", to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"n_name", $"day").agg(sum($"cents").as("xq"))
          .transform(graft.operators.Iterate.truncate) // grid + distinct legs read it
        val days = rev.select($"day").distinct()
        val nats = rev.select($"n_name").distinct()
        val grid = broadcast(nats).crossJoin(days)
          .join(rev, Seq("n_name", "day"), "left")
          .withColumn("xq", coalesce($"xq", lit(0L)))
        val w = Window.partitionBy($"n_name").orderBy($"day")
        val dx = grid
          .withColumn("dx", $"xq" - lag($"xq", 1).over(w))
          .filter($"dx".isNotNull)
        val mkt = dx.groupBy($"day").agg(sum($"dx").as("dm"))
        val joined = dx.join(mkt, "day")
        val mom = joined.groupBy($"n_name").agg(
          count(lit(1)).as("n"),
          sum($"dx".cast("decimal(38,0)")).as("sx"),
          sum($"dm".cast("decimal(38,0)")).as("sm"),
          sum(($"dx" * $"dx").cast("decimal(38,0)")).as("sxx"),
          sum(($"dx" * $"dm").cast("decimal(38,0)")).as("sxm"),
          sum(($"dm" * $"dm").cast("decimal(38,0)")).as("smm"))
        val nd = $"n".cast("double")
        def dbl(c: String) = col(c).cast("double")
        mom.select($"n_name", $"n",
            floor((nd * dbl("sxm") - dbl("sx") * dbl("sm"))
                / (nd * dbl("smm") - dbl("sm") * dbl("sm")) * 1000000 + lit(0.5))
              .cast("long").as("beta_micro"),
            floor(dbl("sx") / nd
                / sqrt((dbl("sxx") - dbl("sx") * dbl("sx") / nd) / (nd - 1.0))
                * 1000000 + lit(0.5))
              .cast("long").as("sharpe_micro"))
          .orderBy($"n_name")
      },
      Some("""WITH rev AS (
             |  SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS xq
             |  FROM orders o
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  GROUP BY 1, 2),
             |grid AS (
             |  SELECT na.n_name, dy.day, COALESCE(r.xq, 0) AS xq
             |  FROM (SELECT DISTINCT n_name FROM rev) na
             |  CROSS JOIN (SELECT DISTINCT day FROM rev) dy
             |  LEFT JOIN rev r ON r.n_name = na.n_name AND r.day = dy.day),
             |dx AS (
             |  SELECT n_name, day,
             |    xq - lag(xq) OVER (PARTITION BY n_name ORDER BY day) AS dx
             |  FROM grid),
             |dd AS (SELECT n_name, day, dx FROM dx WHERE dx IS NOT NULL),
             |mkt AS (SELECT day, CAST(SUM(dx) AS BIGINT) AS dm
             |        FROM dd GROUP BY 1),
             |mom AS (
             |  SELECT d.n_name, COUNT(*) AS n,
             |    CAST(SUM(CAST(d.dx AS HUGEINT)) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(m.dm AS HUGEINT)) AS DOUBLE) AS sm,
             |    CAST(SUM(CAST(d.dx AS HUGEINT) * d.dx) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(d.dx AS HUGEINT) * m.dm) AS DOUBLE) AS sxm,
             |    CAST(SUM(CAST(m.dm AS HUGEINT) * m.dm) AS DOUBLE) AS smm
             |  FROM dd d JOIN mkt m ON d.day = m.day
             |  GROUP BY 1)
             |SELECT n_name, n,
             |  CAST(floor((CAST(n AS DOUBLE) * sxm - sx * sm)
             |    / (CAST(n AS DOUBLE) * smm - sm * sm) * 1000000 + 0.5)
             |    AS BIGINT) AS beta_micro,
             |  CAST(floor(sx / CAST(n AS DOUBLE)
             |    / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
             |           / (CAST(n AS DOUBLE) - 1.0))
             |    * 1000000 + 0.5) AS BIGINT) AS sharpe_micro
             |FROM mom ORDER BY n_name""".stripMargin)),

    // ----- q267: Durbin–Watson serial-correlation diagnostic of the
    // residuals from the daily-revenue OLS trend line
    // (operators.Risk.durbinWatson) — exact BIGINT/HUGEINT moments,
    // fdiv fixed-point slope/intercept, exact integer residuals, and
    // ONE double division for the DW ratio. DW ≈ 2 ⇒ no lag-1
    // autocorrelation; < 1 ⇒ strong positive.
    QueryDef(
      "q267_durbin_watson",
      (s, d) => graft.operators.Risk.durbinWatson(dailyCents(s, d), "day", "xq"),
      Some(s"""WITH $dailySql,
             |rn AS (
             |  SELECT xq, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
             |  FROM ser),
             |mo AS (
             |  SELECT COUNT(*) AS n,
             |    CAST(SUM(t) AS BIGINT) AS st,
             |    CAST(SUM(xq) AS BIGINT) AS sy,
             |    CAST(SUM(t * t) AS BIGINT) AS stt,
             |    CAST(SUM(CAST(t AS HUGEINT) * xq) AS HUGEINT) AS sty
             |  FROM rn),
             |co AS (
             |  SELECT n, st, sy,
             |    CAST(floor(CAST(CAST(n AS HUGEINT) * sty
             |        - CAST(st AS HUGEINT) * sy AS DOUBLE)
             |      / CAST(CAST(n AS HUGEINT) * stt
             |        - CAST(st AS HUGEINT) * st AS DOUBLE)
             |      * 1000) AS BIGINT) AS slope_milli
             |  FROM mo),
             |c2 AS (
             |  SELECT n, slope_milli,
             |    CAST(floor(CAST(1000 * sy - slope_milli * st AS DOUBLE)
             |      / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_milli
             |  FROM co),
             |res AS (
             |  SELECT c2.n, c2.slope_milli, c2.intercept_milli,
             |    1000 * rn.xq - c2.intercept_milli - c2.slope_milli * rn.t
             |      AS e,
             |    rn.t
             |  FROM rn CROSS JOIN c2),
             |lagd AS (
             |  SELECT n, slope_milli, intercept_milli, e,
             |    e - lag(e) OVER (ORDER BY t) AS de
             |  FROM res),
             |sums AS (
             |  SELECT ANY_VALUE(n) AS n, ANY_VALUE(slope_milli) AS slope_milli,
             |    ANY_VALUE(intercept_milli) AS intercept_milli,
             |    CAST(SUM(CAST(de AS HUGEINT) * de) AS HUGEINT) AS sd2,
             |    CAST(SUM(CAST(e AS HUGEINT) * e) AS HUGEINT) AS se2
             |  FROM lagd)
             |SELECT n, slope_milli, intercept_milli,
             |  CAST((sd2 * 2000000 + se2) // (se2 * 2) AS BIGINT) AS dw_micro
             |FROM sums""".stripMargin)),

    // ----- q286: XmR (individuals + moving-range) Shewhart chart
    // over daily revenue (operators.Risk.xmrChart) — the SPC member
    // next to q181 CUSUM: that one accumulates sustained drift, this
    // flags single-day excursions (X chart, x̄ ± 2.66·MR̄) and
    // short-term variance spikes (MR chart, 3.267·MR̄). Flags are
    // cross-multiplied exact integer comparisons, so the whole chart
    // replays with zero tolerance.
    QueryDef(
      "q286_xmr_chart",
      (s, d) => graft.operators.Risk.xmrChart(dailyCents(s, d), "day", "xq"),
      Some(s"""WITH $dailySql,
             |st AS (
             |  SELECT ${QueryFixtures.fdivSql(
                  "CAST(SUM(xq) AS BIGINT)", "COUNT(*)")} AS xbar
             |  FROM ser),
             |dl AS (
             |  SELECT day, xq,
             |    abs(xq - lag(xq) OVER (ORDER BY day)) AS mr
             |  FROM ser),
             |mb AS (
             |  SELECT ${QueryFixtures.fdivSql(
                  "CAST(SUM(mr) AS BIGINT)", "COUNT(*)")} AS mrbar
             |  FROM dl WHERE mr IS NOT NULL)
             |SELECT day, xq, mr,
             |  abs(1000 * (xq - s.xbar)) > 2660 * m.mrbar AS flag_x,
             |  COALESCE(1000 * mr > 3267 * m.mrbar, FALSE) AS flag_mr
             |FROM dl CROSS JOIN st s CROSS JOIN mb m
             |ORDER BY day""".stripMargin)),

    // ----- q287: Huber-weighted IRLS trend of daily revenue
    // (operators.Risk.huberTrend) — the ROBUST regression member
    // next to q267's OLS and q195's Theil–Sen: Huber milli-weights
    // (1 inside 2·median(|e|), T/|e| outside) bound outlier leverage,
    // two fixed reweighting iterations from the OLS start. Exact
    // integer states throughout; the slope update is sign-split
    // exact integer rounding so no >2^63 value is ever cast to
    // double; the whole recurrence (residuals → MAD threshold →
    // weights → weighted normal equations, twice) replays in
    // unrolled CTEs.
    QueryDef(
      "q287_huber_trend",
      (s, d) => graft.operators.Risk.huberTrend(dailyCents(s, d), "day", "xq"),
      Some {
        def f(a: String, b: String) = QueryFixtures.fdivSql(a, b)
        def iter(k: Int, slopeRef: String, interRef: String,
            fromCte: String): String =
          s"""res$k AS MATERIALIZED (
             |  SELECT rn.t, rn.xq,
             |    1000 * rn.xq - $interRef - $slopeRef * rn.t AS e
             |  FROM rn CROSS JOIN $fromCte),
             |th$k AS (
             |  SELECT CAST(floor(2.0 * quantile_cont(abs(e), 0.5) + 0.5)
             |    AS BIGINT) AS th
             |  FROM res$k),
             |wt$k AS (
             |  SELECT r.t, r.xq,
             |    CASE WHEN abs(r.e) <= h.th THEN 1000
             |      ELSE ${f("1000 * h.th", "abs(r.e)")} END AS w
             |  FROM res$k r CROSS JOIN th$k h),
             |mom$k AS (
             |  SELECT CAST(SUM(CAST(w AS HUGEINT)) AS HUGEINT) AS sw,
             |    CAST(SUM(CAST(w AS HUGEINT) * t) AS HUGEINT) AS swt,
             |    CAST(SUM(CAST(w AS HUGEINT) * xq) AS HUGEINT) AS swy,
             |    CAST(SUM(CAST(w AS HUGEINT) * t * t) AS HUGEINT) AS swtt,
             |    CAST(SUM(CAST(w AS HUGEINT) * t * xq) AS HUGEINT) AS swty,
             |    CAST(SUM(w) AS BIGINT) AS sumw
             |  FROM wt$k),
             |sl$k AS (
             |  SELECT sumw,
             |    CASE WHEN (sw * swty - swt * swy < 0)
             |        <> (sw * swtt - swt * swt < 0) THEN -1 ELSE 1 END
             |      * CAST((abs(sw * swty - swt * swy) * 2000
             |          + abs(sw * swtt - swt * swt))
             |        // (abs(sw * swtt - swt * swt) * 2) AS BIGINT)
             |      AS slope_milli,
             |    sw, swt, swy
             |  FROM mom$k),
             |upd$k AS (
             |  SELECT sumw, slope_milli,
             |    CAST(floor(CAST(1000 * swy - CAST(slope_milli AS HUGEINT)
             |        * swt AS DOUBLE)
             |      / CAST(sw AS DOUBLE)) AS BIGINT) AS intercept_milli
             |  FROM sl$k)""".stripMargin
        s"""WITH ser AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS xq
           |  FROM orders GROUP BY 1),
           |rn AS MATERIALIZED (
           |  SELECT xq, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
           |  FROM ser),
           |mo AS (
           |  SELECT COUNT(*) AS n,
           |    CAST(SUM(t) AS BIGINT) AS st,
           |    CAST(SUM(xq) AS BIGINT) AS sy,
           |    CAST(SUM(t * t) AS BIGINT) AS stt,
           |    CAST(SUM(CAST(t AS HUGEINT) * xq) AS HUGEINT) AS sty
           |  FROM rn),
           |co AS (
           |  SELECT n, st, sy,
           |    CAST(floor(CAST(CAST(n AS HUGEINT) * sty
           |        - CAST(st AS HUGEINT) * sy AS DOUBLE)
           |      / CAST(CAST(n AS HUGEINT) * stt
           |        - CAST(st AS HUGEINT) * st AS DOUBLE)
           |      * 1000) AS BIGINT) AS slope_milli
           |  FROM mo),
           |c2 AS (
           |  SELECT n, slope_milli,
           |    CAST(floor(CAST(1000 * sy - slope_milli * st AS DOUBLE)
           |      / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_milli
           |  FROM co),
           |${iter(1, "c2.slope_milli", "c2.intercept_milli", "c2")},
           |${iter(2, "u.slope_milli", "u.intercept_milli", "upd1 u")}
           |SELECT c2.n, c2.slope_milli AS slope0_milli,
           |  u2.slope_milli, u2.intercept_milli, u2.sumw AS sum_w_milli
           |FROM c2 CROSS JOIN upd2 u2""".stripMargin
      }),

    // ----- q295: lower/upper tail dependence between the even- and
    // odd-custkey daily revenue desks (operators.Risk.tailDependence)
    // — the co-crash diagnostic: correlation says the desks move
    // together on average, λ̂ says whether their WORST days coincide
    // (the empirical-copula rank estimator, k = n DIV 5). Exact
    // integer counts under the total (value, day) rank; milli snaps
    // are round-half-up exact integer division on both engines.
    QueryDef(
      "q295_tail_dependence",
      (s, d) => {
        import s.implicits._
        def side(parity: Int) = Tables.orders(s, d)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .filter($"c_custkey" % 2 === parity)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("xq"))
        graft.operators.Risk.tailDependence(side(0), side(1), "day", "xq")
      },
      Some("""WITH sides AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    c_custkey % 2 AS par,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS xq
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |j AS (
             |  SELECT a.day, a.xq AS xv, b.xq AS yv
             |  FROM sides a JOIN sides b ON a.day = b.day
             |  WHERE a.par = 0 AND b.par = 1),
             |nk AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |         CAST(count(*) // 5 AS BIGINT) AS k FROM j),
             |rk AS (
             |  SELECT day,
             |    ROW_NUMBER() OVER (ORDER BY xv, day) AS rx,
             |    ROW_NUMBER() OVER (ORDER BY yv, day) AS ry
             |  FROM j),
             |cnt AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN rx <= (SELECT k FROM nk)
             |      AND ry <= (SELECT k FROM nk) THEN 1 ELSE 0 END)
             |      AS BIGINT) AS both_low,
             |    CAST(SUM(CASE WHEN rx > (SELECT n FROM nk) - (SELECT k FROM nk)
             |      AND ry > (SELECT n FROM nk) - (SELECT k FROM nk)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS both_high
             |  FROM rk)
             |SELECT nk.n, nk.k, c.both_low, c.both_high,
             |  CAST(CASE WHEN nk.k > 0
             |    THEN (c.both_low * 2000 + nk.k) // (2 * nk.k)
             |    ELSE NULL END AS BIGINT) AS lambda_low_milli,
             |  CAST(CASE WHEN nk.k > 0
             |    THEN (c.both_high * 2000 + nk.k) // (2 * nk.k)
             |    ELSE NULL END AS BIGINT) AS lambda_high_milli
             |FROM nk CROSS JOIN cnt c""".stripMargin)),

    // ----- q306: lag-1 Granger causality between the even- and
    // odd-custkey revenue desks (operators.Risk.grangerLag1), BOTH
    // directions — the temporal-precedence companion to q295's tail
    // dependence: F compares y~y₋₁ against y~y₋₁+x₋₁ via closed-form
    // centered moments. Dollar-quantized exact BIGINT raw moments,
    // then ONE all-double chain mirrored operation-for-operation
    // (intermediates exceed int64 identically on both engines),
    // micro-snapped; lags by observed-day order (row_number
    // self-join in the oracle).
    QueryDef(
      "q306_granger_causality",
      (s, d) => {
        import s.implicits._
        def side(parity: Int) = Tables.orders(s, d)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .filter($"c_custkey" % 2 === parity)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("xq"))
        graft.operators.Risk.grangerLag1(side(0), side(1), "day", "xq")
      },
      Some {
        def cen(sab: String, s1: String, s2: String): String =
          s"(CAST(n AS DOUBLE) * CAST($sab AS DOUBLE)" +
            s" - CAST($s1 AS DOUBLE) * CAST($s2 AS DOUBLE))"
        // F expression for response/own-lag/cross-lag centered moments
        def fExpr(cyy: String, cy1y: String, cx1y: String,
            cy1y1: String, cy1x1: String, cx1x1: String): String =
          s"""CASE WHEN n < 4 THEN NULL
             |  WHEN $cy1y1 * $cx1x1 - $cy1x1 * $cy1x1 = 0 THEN NULL
             |  WHEN $cyy
             |      - ($cy1y * $cx1x1 - $cx1y * $cy1x1)
             |        / ($cy1y1 * $cx1x1 - $cy1x1 * $cy1x1) * $cy1y
             |      - ($cx1y * $cy1y1 - $cy1y * $cy1x1)
             |        / ($cy1y1 * $cx1x1 - $cy1x1 * $cy1x1) * $cx1y
             |    <= 0 THEN NULL
             |  ELSE CAST(floor(
             |    (($cyy - $cy1y * $cy1y / $cy1y1)
             |      - ($cyy
             |        - ($cy1y * $cx1x1 - $cx1y * $cy1x1)
             |          / ($cy1y1 * $cx1x1 - $cy1x1 * $cy1x1) * $cy1y
             |        - ($cx1y * $cy1y1 - $cy1y * $cy1x1)
             |          / ($cy1y1 * $cx1x1 - $cy1x1 * $cy1x1) * $cx1y))
             |    * CAST(n - 3 AS DOUBLE)
             |    / ($cyy
             |      - ($cy1y * $cx1x1 - $cx1y * $cy1x1)
             |        / ($cy1y1 * $cx1x1 - $cy1x1 * $cy1x1) * $cy1y
             |      - ($cx1y * $cy1y1 - $cy1y * $cy1x1)
             |        / ($cy1y1 * $cx1x1 - $cy1x1 * $cy1x1) * $cx1y)
             |    * 1000000.0 + 0.5) AS BIGINT) END""".stripMargin
        val xy = fExpr(cen("saa", "sa", "sa"), cen("sac", "sa", "sc"),
          cen("sad", "sa", "sd"), cen("scc", "sc", "sc"),
          cen("scd", "sc", "sd"), cen("sdd", "sd", "sd"))
        val yx = fExpr(cen("sbb", "sb", "sb"), cen("sbd", "sb", "sd"),
          cen("sbc", "sb", "sc"), cen("sdd", "sd", "sd"),
          cen("scd", "sc", "sd"), cen("scc", "sc", "sc"))
        s"""WITH sides AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |    c_custkey % 2 AS par,
           |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS xq
           |  FROM orders JOIN customer ON o_custkey = c_custkey
           |  GROUP BY 1, 2),
           |j AS (
           |  SELECT a.day, a.xq // 100 AS xv, b.xq // 100 AS yv
           |  FROM sides a JOIN sides b ON a.day = b.day
           |  WHERE a.par = 0 AND b.par = 1),
           |rn AS MATERIALIZED (
           |  SELECT xv, yv,
           |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
           |  FROM j),
           |pr AS (
           |  SELECT cur.yv AS a, cur.xv AS b, prev.yv AS c, prev.xv AS d
           |  FROM rn cur JOIN rn prev ON cur.rn = prev.rn + 1),
           |m AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
           |    CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(d) AS BIGINT) AS sd,
           |    CAST(SUM(a * a) AS BIGINT) AS saa,
           |    CAST(SUM(b * b) AS BIGINT) AS sbb,
           |    CAST(SUM(c * c) AS BIGINT) AS scc,
           |    CAST(SUM(d * d) AS BIGINT) AS sdd,
           |    CAST(SUM(a * c) AS BIGINT) AS sac,
           |    CAST(SUM(a * d) AS BIGINT) AS sad,
           |    CAST(SUM(b * c) AS BIGINT) AS sbc,
           |    CAST(SUM(b * d) AS BIGINT) AS sbd,
           |    CAST(SUM(c * d) AS BIGINT) AS scd
           |  FROM pr)
           |SELECT * FROM (
           |  SELECT 'x_to_y' AS direction, n, $xy AS f_micro FROM m
           |  UNION ALL
           |  SELECT 'y_to_x', n, $yx FROM m)
           |ORDER BY direction""".stripMargin
      }),

    // ----- q297: Hurst exponent by rescaled-range analysis of daily
    // revenue (operators.Risk.hurstRs) — the long-memory diagnostic
    // (H > 0.5 persistence, < 0.5 mean reversion) next to q267's
    // lag-1 DW and q245's fixed-lag ACF. Per window size m: exact
    // integer cumulative-deviation ranges R (block means are fdiv),
    // S = sqrt(Σe²/m) — sqrt is IEEE exactly-rounded so the one
    // double chain replays — rs micro-snapped per block, block mean
    // an exact round-half-up integer division; H = OLS slope of
    // ln(mean R/S) on ln(m) from the four snapped means.
    QueryDef(
      "q297_hurst_rs",
      (s, d) => graft.operators.Risk.hurstRs(dailyCents(s, d), "day", "xq"),
      Some {
        val sizes = Seq(8, 16, 32, 64)
        def blocks(m: Int): String =
          s"""rs$m AS (
             |  SELECT $m AS m,
             |    CAST(floor(CAST(GREATEST(maxz, 0) - LEAST(minz, 0) AS DOUBLE)
             |      / sqrt(CAST(se2 AS DOUBLE) / $m) * 1000000 + 0.5)
             |      AS BIGINT) AS rsq
             |  FROM (
             |    SELECT blk,
             |      MAX(cum) AS maxz, MIN(cum) AS minz,
             |      CAST(SUM(e * e) AS BIGINT) AS se2
             |    FROM (
             |      SELECT blk, e,
             |        SUM(e) OVER (PARTITION BY blk ORDER BY rk
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS cum
             |      FROM (
             |        SELECT blk, rk,
             |          xq - CAST(floor(CAST(bs AS DOUBLE) / $m) AS BIGINT)
             |            AS e
             |        FROM (
             |          SELECT (rk - 1) // $m AS blk, rk, xq,
             |            CAST(SUM(xq) OVER (PARTITION BY (rk - 1) // $m)
             |              AS BIGINT) AS bs,
             |            COUNT(*) OVER (PARTITION BY (rk - 1) // $m) AS bn
             |          FROM rkd) WHERE bn = $m))
             |    GROUP BY blk)
             |  WHERE se2 > 0),
             |mu$m AS (
             |  SELECT $m AS m, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             |    CAST(floor(CAST(CAST(SUM(rsq) AS BIGINT) AS DOUBLE)
             |      / COUNT(*)) AS BIGINT) AS mean_rs_micro
             |  FROM rs$m HAVING COUNT(*) > 0)""".stripMargin
        s"""WITH $dailySql,
           |rkd AS (
           |  SELECT xq, ROW_NUMBER() OVER (ORDER BY day) AS rk FROM ser),
           |${sizes.map(blocks).mkString(",\n")},
           |mus AS (${sizes.map(m => s"SELECT * FROM mu$m").mkString(" UNION ALL ")}),
           |pts AS (SELECT ln(CAST(m AS DOUBLE)) AS lx,
           |          ln(CAST(mean_rs_micro AS DOUBLE) / 1000000) AS ly
           |        FROM mus),
           |sl AS (
           |  SELECT CASE WHEN COUNT(*) < 2 THEN 0
           |    ELSE CAST(floor(
           |      (COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly))
           |      / (COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx))
           |      * 1000 + 0.5) AS BIGINT) END AS hurst_milli
           |  FROM pts)
           |SELECT mus.m, mus.n_blocks, mus.mean_rs_micro, sl.hurst_milli
           |FROM mus CROSS JOIN sl ORDER BY mus.m""".stripMargin
      }),

    // ----- q309: Sortino + Calmar ratios per nation over the q266
    // delta grid — the DOWNSIDE-risk members next to q266's
    // symmetric Sharpe: Sortino penalizes only negative deltas
    // (mean / downside deviation), Calmar normalizes net change by
    // the max drawdown of the cumulative delta path. Downside
    // second moment is exact (decimal/HUGEINT); drawdown is exact
    // BIGINT via nation-PARTITIONED running windows (never global);
    // each ratio is ONE identical IEEE chain, micro-snapped, NULL
    // on the degenerate frames (no negative delta / no drawdown).
    QueryDef(
      "q309_sortino_calmar",
      (s, d) => {
        import s.implicits._
        val dd = nationDeltas(s, d)
        val w = Window.partitionBy($"n_name").orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cm = dd.withColumn("cum", sum($"dx").over(w))
        val pk = cm.withColumn("peak", max($"cum").over(w))
        val mx = pk.groupBy($"n_name")
          .agg(max($"peak" - $"cum").as("maxdd"))
        val mom = dd.groupBy($"n_name").agg(
          count(lit(1)).as("n"),
          sum($"dx").as("sx"),
          sum(when($"dx" < 0, $"dx".cast("decimal(38,0)") * $"dx")
            .otherwise(lit(0).cast("decimal(38,0)"))).as("sdn"))
        val nd = $"n".cast("double")
        mom.join(mx, "n_name").select(
            $"n_name", $"n", $"sx".as("net"), $"maxdd",
            when($"sdn" === 0, lit(null).cast("long"))
              .otherwise(floor($"sx".cast("double") / nd
                  / sqrt($"sdn".cast("double") / nd) * 1000000 + lit(0.5))
                .cast("long")).as("sortino_micro"),
            when($"maxdd" === 0, lit(null).cast("long"))
              .otherwise(floor($"sx".cast("double")
                  / $"maxdd".cast("double") * 1000000 + lit(0.5))
                .cast("long")).as("calmar_micro"))
          .orderBy($"n_name")
      },
      Some(s"""WITH $nationDeltaSql,
             |cm AS (
             |  SELECT n_name, day, dx,
             |    CAST(SUM(dx) OVER (PARTITION BY n_name ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum
             |  FROM dd),
             |pk AS (
             |  SELECT n_name, day, cum,
             |    CAST(MAX(cum) OVER (PARTITION BY n_name ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS peak
             |  FROM cm),
             |mx AS (SELECT n_name, CAST(MAX(peak - cum) AS BIGINT) AS maxdd
             |       FROM pk GROUP BY 1),
             |mom AS (
             |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(dx) AS BIGINT) AS sx,
             |    SUM(CASE WHEN dx < 0 THEN CAST(dx AS HUGEINT) * dx
             |        ELSE 0 END) AS sdn
             |  FROM dd GROUP BY 1)
             |SELECT m.n_name, m.n, m.sx AS net, x.maxdd,
             |  CASE WHEN m.sdn = 0 THEN NULL
             |    ELSE CAST(floor(CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE)
             |      / sqrt(CAST(m.sdn AS DOUBLE) / CAST(m.n AS DOUBLE))
             |      * 1000000 + 0.5) AS BIGINT) END AS sortino_micro,
             |  CASE WHEN x.maxdd = 0 THEN NULL
             |    ELSE CAST(floor(CAST(m.sx AS DOUBLE) / CAST(x.maxdd AS DOUBLE)
             |      * 1000000 + 0.5) AS BIGINT) END AS calmar_micro
             |FROM mom m JOIN mx x ON m.n_name = x.n_name
             |ORDER BY m.n_name""".stripMargin)),

    // ----- q310: market-concentration audit per region — HHI
    // (Σ share² over supplier revenue shares) and CR4 (top-4
    // concentration ratio). The industrial-organization member the
    // inequality family (q188 Gini/Lorenz, q223 Theil) stops short
    // of: HHI is the antitrust-grade statistic, CR4 its rank-based
    // cousin. Revenue is exact cents; Σrev² exact decimal/HUGEINT;
    // ranks a region-PARTITIONED row_number (rev desc, suppkey
    // tiebreak); each ratio ONE IEEE chain, micro-snapped.
    QueryDef(
      "q310_hhi_concentration",
      (s, d) => {
        import s.implicits._
        val sup = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            $"s_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)),
            $"n_regionkey" === $"r_regionkey")
          .select($"s_suppkey", $"r_name")
        val rev = Tables.lineitem(s, d)
          .select($"l_suppkey",
            floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"l_suppkey").agg(sum($"cents").as("rev"))
        val j = rev.join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        val w = Window.partitionBy($"r_name").orderBy($"rev".desc, $"s_suppkey")
        val rk = j.withColumn("rk", row_number().over(w))
        val ag = rk.groupBy($"r_name").agg(
          count(lit(1)).as("n_suppliers"),
          sum($"rev".cast("decimal(38,0)")).as("tot"),
          sum($"rev".cast("decimal(38,0)") * $"rev").as("ssq"),
          sum(when($"rk" <= 4, $"rev".cast("decimal(38,0)"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("top4"))
        ag.select($"r_name", $"n_suppliers",
            when($"tot" === 0, lit(null).cast("long"))
              .otherwise(floor($"ssq".cast("double")
                  / ($"tot".cast("double") * $"tot".cast("double"))
                  * 1000000 + lit(0.5)).cast("long")).as("hhi_micro"),
            when($"tot" === 0, lit(null).cast("long"))
              .otherwise(floor($"top4".cast("double") / $"tot".cast("double")
                  * 1000000 + lit(0.5)).cast("long")).as("cr4_micro"))
          .orderBy($"r_name")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS rev
             |  FROM lineitem GROUP BY 1),
             |j AS (
             |  SELECT r.r_name, v.rev, s.s_suppkey
             |  FROM rev v
             |  JOIN supplier s ON v.l_suppkey = s.s_suppkey
             |  JOIN nation n ON s.s_nationkey = n.n_nationkey
             |  JOIN region r ON n.n_regionkey = r.r_regionkey),
             |rk AS (
             |  SELECT r_name, rev,
             |    ROW_NUMBER() OVER (PARTITION BY r_name
             |      ORDER BY rev DESC, s_suppkey) AS rk
             |  FROM j),
             |ag AS (
             |  SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             |    SUM(CAST(rev AS HUGEINT)) AS tot,
             |    SUM(CAST(rev AS HUGEINT) * rev) AS ssq,
             |    SUM(CASE WHEN rk <= 4 THEN CAST(rev AS HUGEINT)
             |        ELSE 0 END) AS top4
             |  FROM rk GROUP BY 1)
             |SELECT r_name, n_suppliers,
             |  CASE WHEN tot = 0 THEN NULL
             |    ELSE CAST(floor(CAST(ssq AS DOUBLE)
             |      / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
             |      * 1000000 + 0.5) AS BIGINT) END AS hhi_micro,
             |  CASE WHEN tot = 0 THEN NULL
             |    ELSE CAST(floor(CAST(top4 AS DOUBLE) / CAST(tot AS DOUBLE)
             |      * 1000000 + 0.5) AS BIGINT) END AS cr4_micro
             |FROM ag ORDER BY r_name""".stripMargin)),

    // ----- q311: Jarque–Bera normality diagnostic of per-nation
    // delta distributions — the moment-based normality member next
    // to q275's Anderson–Darling (CDF-based) and q177's Benford:
    // JB = n/6·(S² + K²/4) from exact third/fourth raw moments.
    // Sums are exact decimal/HUGEINT (dx⁴ headroom documented to
    // ~sf1; the q267 INT128 discipline); skewness, excess kurtosis,
    // and JB are ONE fixed all-double chain over the exact moments
    // (the q302 parity-by-operation-shape convention), micro-snapped,
    // NULL on zero-variance frames.
    QueryDef(
      "q311_jarque_bera",
      (s, d) => {
        import s.implicits._
        val dd = nationDeltas(s, d)
        val dec = $"dx".cast("decimal(38,0)")
        val mom = dd.groupBy($"n_name").agg(
          count(lit(1)).as("n"),
          sum(dec).as("sx"),
          sum(dec * $"dx").as("sxx"),
          sum(dec * $"dx" * $"dx").as("sxxx"),
          sum(dec * $"dx" * $"dx" * $"dx").as("sxxxx"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val nd = db($"n")
        val mean = db($"sx") / nd
        val m2 = db($"sxx") / nd - mean * mean
        val m3 = db($"sxxx") / nd - lit(3.0) * mean * (db($"sxx") / nd) +
          lit(2.0) * mean * mean * mean
        val m4 = db($"sxxxx") / nd - lit(4.0) * mean * (db($"sxxx") / nd) +
          lit(6.0) * mean * mean * (db($"sxx") / nd) -
          lit(3.0) * mean * mean * mean * mean
        val skew = m3 / (m2 * sqrt(m2))
        val exk = m4 / (m2 * m2) - lit(3.0)
        val jb = nd / lit(6.0) * (skew * skew + exk * exk / lit(4.0))
        mom.select($"n_name", $"n",
            when(m2 <= 0, lit(null).cast("long"))
              .otherwise(floor(skew * 1000000 + lit(0.5)).cast("long"))
              .as("skew_micro"),
            when(m2 <= 0, lit(null).cast("long"))
              .otherwise(floor(exk * 1000000 + lit(0.5)).cast("long"))
              .as("exkurt_micro"),
            when(m2 <= 0, lit(null).cast("long"))
              .otherwise(floor(jb * 1000000 + lit(0.5)).cast("long"))
              .as("jb_micro"))
          .orderBy($"n_name")
      },
      Some(s"""WITH $nationDeltaSql,
             |mo AS (
             |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(CAST(dx AS HUGEINT)) AS sx,
             |    SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
             |    SUM(CAST(dx AS HUGEINT) * dx * dx) AS sxxx,
             |    SUM(CAST(dx AS HUGEINT) * dx * dx * dx) AS sxxxx
             |  FROM dd GROUP BY 1),
             |ch AS (
             |  SELECT n_name, n, CAST(n AS DOUBLE) AS nd,
             |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             |    CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) AS m2r,
             |    CAST(sxxx AS DOUBLE) / CAST(n AS DOUBLE) AS m3r,
             |    CAST(sxxxx AS DOUBLE) / CAST(n AS DOUBLE) AS m4r
             |  FROM mo),
             |m AS (
             |  SELECT n_name, n, nd,
             |    m2r - mean * mean AS m2,
             |    m3r - 3.0 * mean * m2r + 2.0 * mean * mean * mean AS m3,
             |    m4r - 4.0 * mean * m3r + 6.0 * mean * mean * m2r
             |      - 3.0 * mean * mean * mean * mean AS m4
             |  FROM ch),
             |st AS (
             |  SELECT n_name, n, nd, m2,
             |    m3 / (m2 * sqrt(m2)) AS skew,
             |    m4 / (m2 * m2) - 3.0 AS exk
             |  FROM m)
             |SELECT n_name, n,
             |  CASE WHEN m2 <= 0 THEN NULL
             |    ELSE CAST(floor(skew * 1000000 + 0.5) AS BIGINT)
             |    END AS skew_micro,
             |  CASE WHEN m2 <= 0 THEN NULL
             |    ELSE CAST(floor(exk * 1000000 + 0.5) AS BIGINT)
             |    END AS exkurt_micro,
             |  CASE WHEN m2 <= 0 THEN NULL
             |    ELSE CAST(floor(nd / 6.0 * (skew * skew + exk * exk / 4.0)
             |      * 1000000 + 0.5) AS BIGINT) END AS jb_micro
             |FROM st ORDER BY n_name""".stripMargin)),

    // ----- q317: SAX motif census of the daily-revenue series —
    // symbolic aggregate discretization (Lin et al. 2003) with
    // EMPIRICAL quartile breakpoints (exact-NTILE rank buckets →
    // alphabet a–d; no Gaussian table, no libm) and a 3-gram motif
    // frequency table: the "which short shapes recur" time-series
    // pattern-mining member next to q261's periodogram (spectral)
    // and q262's changepoint (level shifts). Symbolization is an
    // exact rank operation (ntileRank ≡ SQL NTILE, xq/day
    // tie-break); the trigram shift is a zipRank self-join (no
    // global window); counts exact.
    QueryDef(
      "q317_sax_motifs",
      (s, d) => {
        import s.implicits._
        val ser = dailyCents(s, d)
        val binned = graft.operators.GlobalOrder.ntileRank(
          ser, Seq($"xq".asc, $"day".asc), 4, "g")
        val sym = binned.select($"day",
          expr("substring('abcd', CAST(g AS INT), 1)").as("sy"))
        val rk = graft.operators.GlobalOrder.zipRank(sym.sort($"day"), "rk")
          .transform(graft.operators.Iterate.truncate) // three shifted copies read it
        val s1 = rk.select($"rk".as("r1"), $"sy".as("sy1"))
        val s2 = rk.select($"rk".as("r2"), $"sy".as("sy2"))
        rk.join(s1, $"r1" === $"rk" + 1L)
          .join(s2, $"r2" === $"rk" + 2L)
          .select(concat($"sy", $"sy1", $"sy2").as("motif"))
          .groupBy($"motif").agg(count(lit(1)).as("cnt"))
          .orderBy($"motif")
      },
      Some(s"""WITH $dailySql,
             |bn AS (
             |  SELECT day,
             |    CAST(NTILE(4) OVER (ORDER BY xq, day) AS BIGINT) AS g
             |  FROM ser),
             |sym AS (
             |  SELECT day, substr('abcd', CAST(g AS INT), 1) AS sy FROM bn),
             |rkd AS (
             |  SELECT sy, ROW_NUMBER() OVER (ORDER BY day) AS rk FROM sym),
             |tri AS (
             |  SELECT a.sy || b.sy || c.sy AS motif
             |  FROM rkd a
             |  JOIN rkd b ON b.rk = a.rk + 1
             |  JOIN rkd c ON c.rk = a.rk + 2)
             |SELECT motif, CAST(COUNT(*) AS BIGINT) AS cnt
             |FROM tri GROUP BY 1 ORDER BY motif""".stripMargin)),

    // ----- q325: Omega ratio (threshold 0) per nation — the
    // GAIN/LOSS-mass member completing the downside family (q309
    // Sortino penalizes loss variance, q265 ES reads the tail mean;
    // Omega reads the full distribution as Σgains/Σlosses). Exact
    // BIGINT gain/loss sums over the q266 delta grid and ONE exact
    // integer ppm division — zero tolerance, NULL when a nation
    // never loses.
    QueryDef(
      "q325_omega_ratio",
      (s, d) => {
        import s.implicits._
        val dd = nationDeltas(s, d)
        dd.groupBy($"n_name").agg(
            count(lit(1)).as("n"),
            sum(when($"dx" > 0, $"dx").otherwise(0L)).as("gains"),
            sum(when($"dx" < 0, -$"dx").otherwise(0L)).as("losses"),
            sum(when($"dx" > 0, 1L).otherwise(0L)).as("n_up"),
            sum(when($"dx" < 0, 1L).otherwise(0L)).as("n_down"))
          .select($"n_name", $"n", $"gains", $"losses", $"n_up", $"n_down",
            when($"losses" === 0L, lit(null).cast("long"))
              .otherwise(expr("gains * 1000000 DIV losses"))
              .as("omega_micro"))
          .orderBy($"n_name")
      },
      Some(s"""WITH $nationDeltaSql,
             |ag AS (
             |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN dx > 0 THEN dx ELSE 0 END)
             |      AS BIGINT) AS gains,
             |    CAST(SUM(CASE WHEN dx < 0 THEN -dx ELSE 0 END)
             |      AS BIGINT) AS losses,
             |    CAST(SUM(CASE WHEN dx > 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_up,
             |    CAST(SUM(CASE WHEN dx < 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_down
             |  FROM dd GROUP BY 1)
             |SELECT n_name, n, gains, losses, n_up, n_down,
             |  CASE WHEN losses = 0 THEN NULL
             |    ELSE gains * 1000000 // losses END AS omega_micro
             |FROM ag ORDER BY n_name""".stripMargin)),

    // ----- q340: per-day regression influence diagnostics of the
    // q267 trend fit (operators.Risk.cooksDistance) — leverage h_t
    // and Cook's distance per observation, flagging the days that
    // bent the line (D > 4/n, an exact integer cross-multiplication).
    // The e²/s² ratio is exact integer floor divisions before any
    // double (the q267 HUGEINT→DOUBLE discipline); h and the final
    // chain replay verbatim in the oracle.
    QueryDef(
      "q340_cooks_distance",
      (s, d) => graft.operators.Risk
        .cooksDistance(dailyCents(s, d), "day", "xq"),
      Some(s"""WITH $dailySql,
             |rn AS (
             |  SELECT day, xq,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
             |  FROM ser),
             |mo AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(t) AS BIGINT) AS st,
             |    CAST(SUM(xq) AS BIGINT) AS sy,
             |    CAST(SUM(t * t) AS BIGINT) AS stt,
             |    CAST(SUM(CAST(t AS HUGEINT) * xq) AS HUGEINT) AS sty
             |  FROM rn),
             |co AS (
             |  SELECT n, st, sy, stt,
             |    CAST(floor(CAST(CAST(n AS HUGEINT) * sty
             |        - CAST(st AS HUGEINT) * sy AS DOUBLE)
             |      / CAST(CAST(n AS HUGEINT) * stt
             |        - CAST(st AS HUGEINT) * st AS DOUBLE)
             |      * 1000) AS BIGINT) AS slope_milli
             |  FROM mo),
             |c2 AS (
             |  SELECT n, st, stt, slope_milli,
             |    CAST(floor(CAST(1000 * sy - slope_milli * st AS DOUBLE)
             |      / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_milli
             |  FROM co),
             |res AS (
             |  SELECT rn.day, rn.xq, rn.t,
             |    1000 * rn.xq - c2.intercept_milli - c2.slope_milli * rn.t
             |      AS e
             |  FROM rn CROSS JOIN c2),
             |sq AS (
             |  SELECT CASE WHEN (SELECT n FROM mo) > 2
             |    THEN SUM(CAST(e AS HUGEINT) * e)
             |      // ((SELECT n FROM mo) - 2)
             |    ELSE 0 END AS s2q
             |  FROM res)
             |SELECT r.day, r.xq, r.e AS e_milli,
             |  CAST(floor((1.0 / CAST(m.n AS DOUBLE)
             |    + (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |        / CAST(m.n AS DOUBLE))
             |      * (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |        / CAST(m.n AS DOUBLE))
             |      / (CAST(m.stt AS DOUBLE) - CAST(m.st AS DOUBLE)
             |        * CAST(m.st AS DOUBLE) / CAST(m.n AS DOUBLE)))
             |    * 1000000.0 + 0.5) AS BIGINT) AS h_micro,
             |  CASE WHEN q.s2q = 0 THEN 0
             |    ELSE CAST(floor(
             |      CAST((CAST(r.e AS HUGEINT) * r.e * 1000000) // q.s2q
             |        AS DOUBLE) / 1000000.0
             |      * (1.0 / CAST(m.n AS DOUBLE)
             |        + (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          * (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          / (CAST(m.stt AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            * CAST(m.st AS DOUBLE) / CAST(m.n AS DOUBLE)))
             |      / (2.0 * (1.0 - (1.0 / CAST(m.n AS DOUBLE)
             |        + (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          * (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          / (CAST(m.stt AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            * CAST(m.st AS DOUBLE) / CAST(m.n AS DOUBLE))))
             |        * (1.0 - (1.0 / CAST(m.n AS DOUBLE)
             |        + (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          * (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          / (CAST(m.stt AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            * CAST(m.st AS DOUBLE) / CAST(m.n AS DOUBLE)))))
             |      * 1000000.0 + 0.5) AS BIGINT) END AS cook_micro,
             |  CASE WHEN q.s2q = 0 THEN FALSE
             |    ELSE CAST(floor(
             |      CAST((CAST(r.e AS HUGEINT) * r.e * 1000000) // q.s2q
             |        AS DOUBLE) / 1000000.0
             |      * (1.0 / CAST(m.n AS DOUBLE)
             |        + (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          * (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          / (CAST(m.stt AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            * CAST(m.st AS DOUBLE) / CAST(m.n AS DOUBLE)))
             |      / (2.0 * (1.0 - (1.0 / CAST(m.n AS DOUBLE)
             |        + (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          * (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          / (CAST(m.stt AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            * CAST(m.st AS DOUBLE) / CAST(m.n AS DOUBLE))))
             |        * (1.0 - (1.0 / CAST(m.n AS DOUBLE)
             |        + (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          * (CAST(r.t AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            / CAST(m.n AS DOUBLE))
             |          / (CAST(m.stt AS DOUBLE) - CAST(m.st AS DOUBLE)
             |            * CAST(m.st AS DOUBLE) / CAST(m.n AS DOUBLE)))))
             |      * 1000000.0 + 0.5) AS BIGINT) * m.n > 4000000 END
             |    AS influential
             |FROM res r CROSS JOIN mo m CROSS JOIN sq q
             |ORDER BY r.day""".stripMargin)),

    // ----- q341: partial autocorrelation (lags 1–3) of daily
    // revenue by Durbin–Levinson — the AR-ORDER diagnostic next to
    // q245's raw ACF (which confounds direct and propagated
    // correlation; PACF isolates the direct lag-k effect, the "how
    // many AR terms" read). Series is centered on the fdiv milli
    // mean (exact integers); each ACF rₖ is ONE double division of
    // exact decimal/HUGEINT sums; the three-step Durbin–Levinson
    // recursion is a fixed double chain over the three r values,
    // micro-snapped. Lag shifts are zipRank self-joins (no global
    // window).
    QueryDef(
      "q341_pacf",
      (s, d) => {
        import s.implicits._
        val ser = dailyCents(s, d)
        val mo = ser.agg(count(lit(1)).as("n"), sum($"xq").as("sx"))
        val cen = ser.crossJoin(mo)
          .select($"day",
            (lit(1000L) * $"xq" - expr("CAST(floor(CAST(1000 * sx AS DOUBLE)"
              + " / CAST(n AS DOUBLE)) AS BIGINT)")).as("c"))
        val rk = graft.operators.GlobalOrder.zipRank(cen.sort($"day"), "rk")
          .select($"rk", $"c")
          .transform(graft.operators.Iterate.truncate) // four shifted copies read it
        def lagSum(k: Int) = rk.as("a")
          .join(rk.as("b").select($"rk".as("rk2"), $"c".as("c2")),
            $"rk2" === $"rk" + k.toLong)
          .agg(sum(($"c".cast("decimal(38,0)") * $"c2")).as(s"g$k"))
        val g0 = rk.agg(sum(($"c".cast("decimal(38,0)") * $"c")).as("g0"))
        val j = g0.crossJoin(lagSum(1)).crossJoin(lagSum(2))
          .crossJoin(lagSum(3))
        // each rₖ is an EXACT sign-split integer micro division (the
        // decimal sums exceed the exact HUGEINT→DOUBLE window, so the
        // quantization happens in integer space on both engines)
        def rMicro(k: Int) = expr(
          s"""CASE WHEN g$k >= 0
             |  THEN CAST(g$k * 1000000 DIV g0 AS LONG)
             |  ELSE -CAST((-g$k) * 1000000 DIV g0 AS LONG) END""".stripMargin)
        val q = j.select(rMicro(1).as("r1q"), rMicro(2).as("r2q"),
          rMicro(3).as("r3q"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val r1 = db($"r1q") / lit(1000000.0)
        val r2 = db($"r2q") / lit(1000000.0)
        val r3 = db($"r3q") / lit(1000000.0)
        val p22 = (r2 - r1 * r1) / (lit(1.0) - r1 * r1)
        val p21 = r1 - p22 * r1
        val p33 = (r3 - p21 * r2 - p22 * r1) /
          (lit(1.0) - p21 * r1 - p22 * r2)
        q.select(
          floor(r1 * 1000000 + lit(0.5)).cast("long").as("pacf1_micro"),
          floor(p22 * 1000000 + lit(0.5)).cast("long").as("pacf2_micro"),
          floor(p33 * 1000000 + lit(0.5)).cast("long").as("pacf3_micro"))
      },
      Some(s"""WITH $dailySql,
             |mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(xq) AS BIGINT) AS sx
             |  FROM ser),
             |cen AS (
             |  SELECT s.day,
             |    1000 * s.xq - CAST(floor(CAST(1000 * m.sx AS DOUBLE)
             |      / CAST(m.n AS DOUBLE)) AS BIGINT) AS c
             |  FROM ser s CROSS JOIN mo m),
             |rk AS MATERIALIZED (
             |  SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT)
             |    AS rk
             |  FROM cen),
             |g0 AS (SELECT SUM(CAST(c AS HUGEINT) * c) AS g0 FROM rk),
             |g1 AS (SELECT SUM(CAST(a.c AS HUGEINT) * b.c) AS g1
             |  FROM rk a JOIN rk b ON b.rk = a.rk + 1),
             |g2 AS (SELECT SUM(CAST(a.c AS HUGEINT) * b.c) AS g2
             |  FROM rk a JOIN rk b ON b.rk = a.rk + 2),
             |g3 AS (SELECT SUM(CAST(a.c AS HUGEINT) * b.c) AS g3
             |  FROM rk a JOIN rk b ON b.rk = a.rk + 3),
             |qs AS (
             |  SELECT
             |    CASE WHEN g1 >= 0 THEN CAST(g1 * 1000000 // g0 AS BIGINT)
             |      ELSE -CAST((-g1) * 1000000 // g0 AS BIGINT) END AS r1q,
             |    CASE WHEN g2 >= 0 THEN CAST(g2 * 1000000 // g0 AS BIGINT)
             |      ELSE -CAST((-g2) * 1000000 // g0 AS BIGINT) END AS r2q,
             |    CASE WHEN g3 >= 0 THEN CAST(g3 * 1000000 // g0 AS BIGINT)
             |      ELSE -CAST((-g3) * 1000000 // g0 AS BIGINT) END AS r3q
             |  FROM g0 CROSS JOIN g1 CROSS JOIN g2 CROSS JOIN g3),
             |ch AS (
             |  SELECT CAST(r1q AS DOUBLE) / 1000000.0 AS r1,
             |    CAST(r2q AS DOUBLE) / 1000000.0 AS r2,
             |    CAST(r3q AS DOUBLE) / 1000000.0 AS r3
             |  FROM qs),
             |dl AS (
             |  SELECT r1, r2, r3,
             |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
             |  FROM ch),
             |dl2 AS (
             |  SELECT r1, r2, r3, p22, r1 - p22 * r1 AS p21 FROM dl)
             |SELECT
             |  CAST(floor(r1 * 1000000 + 0.5) AS BIGINT) AS pacf1_micro,
             |  CAST(floor(p22 * 1000000 + 0.5) AS BIGINT) AS pacf2_micro,
             |  CAST(floor((r3 - p21 * r2 - p22 * r1)
             |    / (1.0 - p21 * r1 - p22 * r2) * 1000000 + 0.5) AS BIGINT)
             |    AS pacf3_micro
             |FROM dl2""".stripMargin)),

    // ----- q318: pairs-trading spread (Engle–Granger step 1)
    // between the two LARGEST nation revenue series — hedge-ratio
    // OLS of y on x over the aligned zero-filled grid, exact
    // integer milli residuals under the q267 fdiv slope/intercept
    // convention, and the spread-breach count |e − ē| > 2σ_e as a
    // CROSS-MULTIPLIED exact integer comparison
    // ((n·e − Σe)² > 4·(n·Σe² − (Σe)²)) — no sqrt, no tolerance.
    // Pair selection is deterministic (total revenue desc, name
    // tie-break; a 2-row driver-bounded collect, the q136 class).
    QueryDef(
      "q318_pairs_spread",
      (s, d) => {
        import s.implicits._
        val (rev, grid) = nationGrid(s, d)
        val top = rev.groupBy($"n_name").agg(sum($"xq").as("t"))
          .orderBy($"t".desc, $"n_name").limit(2).collect()
        val (natX, natY) = (top(0).getString(0), top(1).getString(0))
        val xs = grid.filter($"n_name" === natX)
          .select($"day", $"xq".as("x"))
        val ys = grid.filter($"n_name" === natY)
          .select($"day", $"xq".as("y"))
        val xy = xs.join(ys, "day").transform(graft.operators.Iterate.truncate) // two passes
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val mo = xy.agg(count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum(dec($"x") * $"x").as("sxx"),
          sum(dec($"x") * $"y").as("sxy"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val co = mo.select($"n", $"sx", $"sy",
          floor(db(dec($"n") * $"sxy" - dec($"sx") * $"sy")
            / db(dec($"n") * $"sxx" - dec($"sx") * $"sx") * 1000)
            .cast("long").as("slope_milli"))
        val c2 = co.select($"n", $"slope_milli",
          floor(db(dec(lit(1000)) * $"sy" - dec($"slope_milli") * $"sx")
            / db($"n")).cast("long").as("intercept_milli"))
        val res = xy.crossJoin(c2)
          .select($"n", $"slope_milli", $"intercept_milli",
            (lit(1000L) * $"y" - $"intercept_milli"
              - $"slope_milli" * $"x").as("e"))
        val s2 = res.groupBy($"n", $"slope_milli", $"intercept_milli").agg(
          count(lit(1)).as("n2"),
          sum($"e").as("se"),
          sum(dec($"e") * $"e").as("se2"))
        val lhs = dec($"n2") * $"e" - $"se"
        val br = res.select($"e").crossJoin(s2)
          .agg(sum(when(lhs * lhs >
              dec(lit(4)) * (dec($"n2") * $"se2" - dec($"se") * $"se"), 1L)
            .otherwise(0L)).as("n_breach"))
        c2.select(lit(natX).as("nat_x"), lit(natY).as("nat_y"),
            $"n", $"slope_milli", $"intercept_milli")
          .crossJoin(br)
      },
      Some(s"""WITH rev AS (
             |  SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS xq
             |  FROM orders o
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  GROUP BY 1, 2),
             |grid AS (
             |  SELECT na.n_name, dy.day, COALESCE(r.xq, 0) AS xq
             |  FROM (SELECT DISTINCT n_name FROM rev) na
             |  CROSS JOIN (SELECT DISTINCT day FROM rev) dy
             |  LEFT JOIN rev r ON r.n_name = na.n_name AND r.day = dy.day),
             |tot AS (SELECT n_name, CAST(SUM(xq) AS BIGINT) AS t
             |        FROM rev GROUP BY 1),
             |pick AS (SELECT n_name,
             |    ROW_NUMBER() OVER (ORDER BY t DESC, n_name) AS pr
             |  FROM tot),
             |xy AS (
             |  SELECT gx.day, gx.xq AS x, gy.xq AS y
             |  FROM grid gx
             |  JOIN pick px ON px.n_name = gx.n_name AND px.pr = 1
             |  JOIN grid gy ON gy.day = gx.day
             |  JOIN pick py ON py.n_name = gy.n_name AND py.pr = 2),
             |mo AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx,
             |    CAST(SUM(y) AS BIGINT) AS sy,
             |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
             |    SUM(CAST(x AS HUGEINT) * y) AS sxy
             |  FROM xy),
             |co AS (
             |  SELECT n, sx, sy,
             |    CAST(floor(CAST(CAST(n AS HUGEINT) * sxy
             |        - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             |      / CAST(CAST(n AS HUGEINT) * sxx
             |        - CAST(sx AS HUGEINT) * sx AS DOUBLE)
             |      * 1000) AS BIGINT) AS slope_milli
             |  FROM mo),
             |c2 AS (
             |  SELECT n, slope_milli,
             |    CAST(floor(CAST(CAST(1000 AS HUGEINT) * sy
             |        - CAST(slope_milli AS HUGEINT) * sx AS DOUBLE)
             |      / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_milli
             |  FROM co),
             |res AS (
             |  SELECT 1000 * xy.y - c2.intercept_milli
             |    - c2.slope_milli * xy.x AS e
             |  FROM xy CROSS JOIN c2),
             |s2 AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n2,
             |    CAST(SUM(e) AS BIGINT) AS se,
             |    SUM(CAST(e AS HUGEINT) * e) AS se2
             |  FROM res),
             |br AS (
             |  SELECT CAST(SUM(CASE WHEN
             |      (CAST(n2 AS HUGEINT) * e - se)
             |        * (CAST(n2 AS HUGEINT) * e - se)
             |      > 4 * (CAST(n2 AS HUGEINT) * se2
             |        - CAST(se AS HUGEINT) * se)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_breach
             |  FROM res CROSS JOIN s2)
             |SELECT px.n_name AS nat_x, py.n_name AS nat_y,
             |  c2.n, c2.slope_milli, c2.intercept_milli, br.n_breach
             |FROM (SELECT n_name FROM pick WHERE pr = 1) px
             |CROSS JOIN (SELECT n_name FROM pick WHERE pr = 2) py
             |CROSS JOIN c2 CROSS JOIN br""".stripMargin))
  )
}
