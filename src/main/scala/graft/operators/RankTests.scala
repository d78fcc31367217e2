package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample nonparametric tests — Kolmogorov–Smirnov and
  * Mann–Whitney U — over a value column split into two cohorts by a
  * boolean. The distribution-shift detectors a data pipeline runs
  * between corpus versions / A-B cohorts when no parametric form is
  * assumed.
  *
  * Exactness: both statistics are EXACT integer algebra on grouped
  * counts —
  *  - KS: D = max_v |F1(v) − F2(v)| is kept as the integer
  *    cross-product |cum1·n2 − cum2·n1| over the merged support
  *    (denominator n1·n2), so the max and its location are
  *    engine-independent with no tolerance;
  *  - MWU: doubled tie-averaged ranks 2·rank(v) = 2·cumBefore + cnt
  *    + 1 are integers, so the doubled rank-sum U2 = 2U is exact,
  *    as is the tie-correction term Σ(t³−t);
  * the final z normalization is one fixed IEEE double chain ending
  * in one exactly-rounded sqrt (r6-snapped), the q167 discipline.
  *
  * Scale shape: one groupBy(value) shuffle; every later frame is
  * support-sized (distinct values), never corpus-sized. Cumulative
  * counts use [[GlobalOrder.runningSum]] — the two-pass prefix sum,
  * no single-partition window. Headroom: cum·n ≤ n² < 2^53 for
  * n < 9·10^7 per cohort.
  */
object RankTests {

  /** Per-distinct-value merged-support counts with running totals:
    * (v, c1, c2, cum1, cum2) sorted by v ascending.
    */
  private def support(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val byV = df.groupBy(col(valueCol).as("v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("c1"),
        sum(when(isA, 0L).otherwise(1L)).as("c2"))
      .withColumn("c1d", col("c1").cast("decimal(38,0)"))
      .withColumn("c2d", col("c2").cast("decimal(38,0)"))
    val r1 = GlobalOrder.runningSum(byV, Seq(col("v").asc), "c1d", "cum1d")
    GlobalOrder.runningSum(r1, Seq(col("v").asc), "c2d", "cum2d")
      .select(col("v"), col("c1"), col("c2"),
        col("cum1d").cast("long").as("cum1"),
        col("cum2d").cast("long").as("cum2"))
      // support-sized frame consumed twice downstream (totals + the
      // main read) — materialize once instead of re-running the
      // groupBy + two prefix-sum passes
      .transform(graft.operators.Iterate.truncate)
  }

  /** One-row KS report: (v_at, n1, n2, d_num, d_den, ks_micro) with
    * d_num/d_den = D = sup|F1−F2| as an exact rational and v_at the
    * smallest value attaining it.
    */
  def ks(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val sup = support(df, valueCol, isA)
    val tot = sup.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    sup.crossJoin(broadcast(tot))
      .withColumn("d_num", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .orderBy(col("d_num").desc, col("v").asc).limit(1)
      .select(col("v").as("v_at"), col("n1"), col("n2"), col("d_num"),
        (col("n1") * col("n2")).as("d_den"),
        floor(col("d_num").cast("double") / (col("n1") * col("n2")).cast("double")
          * 1000000 + lit(0.5)).cast("long").as("ks_micro"))
  }

  /** One-row Mann–Whitney report: (n1, n2, u2, tie_sum, z_micro) —
    * u2 = 2U for cohort A (tie-averaged), tie-corrected normal
    * approximation.
    */
  def mannWhitneyU(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val sup = support(df, valueCol, isA)
    val terms = sup.select(
      col("c1"), col("c2"),
      // 2·avgRank = 2·cumBefore + cnt + 1; cumBefore = cum − cnt
      (col("c1") * (lit(2L) * (col("cum1") + col("cum2") - col("c1") - col("c2"))
        + col("c1") + col("c2") + 1L)).as("r2a_term"),
      (((col("c1") + col("c2")) * (col("c1") + col("c2")) * (col("c1") + col("c2")))
        - (col("c1") + col("c2"))).as("tie_term"))
    val agg = terms.agg(
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
      sum(col("r2a_term")).as("r2a"), sum(col("tie_term")).as("tie_sum"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val nd = (col("n1") + col("n2")).cast("double")
    val u2 = col("r2a") - col("n1") * (col("n1") + 1L)
    val varU = n1d * n2d / 12.0 *
      ((nd + 1.0) - col("tie_sum").cast("double") / (nd * (nd - 1.0)))
    agg.select(col("n1"), col("n2"), u2.as("u2"), col("tie_sum"),
      floor((u2.cast("double") - n1d * n2d) / 2.0 / sqrt(varU) * 1000000
        + lit(0.5)).cast("long").as("z_micro"))
  }

  /** One-row Spearman rank correlation (tie-averaged; the Pearson-
    * over-ranks definition, which stays correct under ties where the
    * 6Σd² shortcut does not): (n, rho_micro). Doubled ranks keep all
    * moments exact (decimal-summed); ρ is the q170 double chain.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rows = df.select(col(xCol).as("x"), col(yCol).as("y"))
    def rankTable(c: String, out: String): DataFrame = {
      val byV = rows.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("cntd", col("cnt").cast("decimal(38,0)"))
      GlobalOrder.runningSum(byV, Seq(col("v").asc), "cntd", "cumd")
        .select(col("v").as(c),
          (lit(2L) * col("cumd").cast("long") - col("cnt") + 1L).as(out))
    }
    val j = rows.join(rankTable("x", "r2x"), "x").join(rankTable("y", "r2y"), "y")
    val m = j.agg(count(lit(1)).as("n"),
      sum(col("r2x").cast("decimal(38,0)")).as("sx"),
      sum(col("r2y").cast("decimal(38,0)")).as("sy"),
      sum((col("r2x") * col("r2x")).cast("decimal(38,0)")).as("sxx"),
      sum((col("r2y") * col("r2y")).cast("decimal(38,0)")).as("syy"),
      sum((col("r2x") * col("r2y")).cast("decimal(38,0)")).as("sxy"))
    val nd = col("n").cast("double")
    def sd(nm: String) = col(nm).cast("double")
    val num = nd * sd("sxy") - sd("sx") * sd("sy")
    val den = sqrt(nd * sd("sxx") - sd("sx") * sd("sx")) *
      sqrt(nd * sd("syy") - sd("sy") * sd("sy"))
    m.select(col("n"),
      floor(num / den * 1000000 + lit(0.5)).cast("long").as("rho_micro"))
  }

  /** One-row two-sample Cramér–von Mises statistic — KS's companion
    * that weighs the WHOLE CDF gap, not just its maximum:
    *   T = Σ_v c_v·D_v² / (n1·n2·N²),  D_v = cum1·n2 − cum2·n1.
    * D_v is the same exact integer cross-product [[ks]] maximizes;
    * each value's c·D²/(n1·n2) term is one fixed double expression
    * floor-snapped to BIGINT before the exact support sum (order-
    * free), and only the final /N² is a live double. Returns
    * (n1, n2, t_micro).
    */
  def cramerVonMises(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val sup = support(df, valueCol, isA)
    val tot = sup.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val d = col("cum1") * col("n2") - col("cum2") * col("n1")
    val terms = sup.crossJoin(tot).select(col("n1"), col("n2"),
      floor(d.cast("double") * d * (col("c1") + col("c2"))
        / col("n1") / col("n2")).cast("long").as("term"))
    val agg = terms.groupBy(col("n1"), col("n2"))
      .agg(sum(col("term")).as("s"))
    val nd = (col("n1") + col("n2")).cast("double")
    agg.select(col("n1"), col("n2"),
      floor(col("s").cast("double") / (nd * nd) * 1000000 + lit(0.5))
        .cast("long").as("t_micro"))
  }

  /** One-row Kruskal–Wallis H test (1952) — the k-group extension of
    * [[mannWhitneyU]]: doubled tie-averaged midranks per distinct
    * value (exact integers), per-group doubled rank sums R2_g, then
    *   H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)
    * with the Σ(t³−t) tie correction. Each group's R2²/(4n_g) term is
    * floor-snapped to an exact BIGINT before the cross-group sum (the
    * order-free-sum contract; a raw double Σ over groups would drift
    * with grouping order), so only the final H assembly is a fixed
    * double chain. Returns (n_total, n_groups, tie_sum, h_micro,
    * h_corr_micro).
    *
    * Scale shape: one groupBy(value) + one groupBy(group, value)
    * shuffle; everything after is support- or group-sized. Headroom:
    * the snapped term needs R2_g²/(4n_g) < 2^63 — R2_g ≤ 2N² means
    * N ≲ 2·10⁶ rows in one group before the term itself must drop a
    * scale tier (the RocEval headroom-note pattern).
    */
  def kruskalWallis(df: DataFrame, valueCol: String, grpCol: String): DataFrame = {
    val byV = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("cv"))
      .withColumn("cvd", col("cv").cast("decimal(38,0)"))
    val pref = GlobalOrder.runningSum(byV, Seq(col("v").asc), "cvd", "cumd")
      .select(col("v"),
        (lit(2L) * (col("cumd").cast("long") - col("cv")) + col("cv") + 1L)
          .as("r2"),
        (col("cv") * col("cv") * col("cv") - col("cv")).as("tie_term"))
    val gv = df.groupBy(col(grpCol).as("grp"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cgv"))
    val perG = gv.join(pref.select(col("v"), col("r2")), "v")
      .groupBy(col("grp"))
      .agg(sum(col("cgv")).as("ng"), sum(col("cgv") * col("r2")).as("r2g"))
      .select(col("ng"),
        floor(col("r2g").cast("double") * col("r2g") / (lit(4.0) * col("ng")))
          .cast("long").as("term"))
    val ties = pref.agg(sum(col("tie_term")).as("tie_sum"))
    val agg = perG.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
      sum(col("term")).as("s"))
    val m = agg.crossJoin(ties)
    val nd = col("n").cast("double")
    val h = lit(12.0) / (nd * (nd + 1.0)) * col("s").cast("double") -
      lit(3.0) * (nd + 1.0)
    val corr = lit(1.0) - col("tie_sum").cast("double") / (nd * nd * nd - nd)
    m.select(col("n").as("n_total"), col("k").as("n_groups"), col("tie_sum"),
      floor(h * 1000000 + lit(0.5)).cast("long").as("h_micro"),
      floor(h / corr * 1000000 + lit(0.5)).cast("long").as("h_corr_micro"))
  }
}
