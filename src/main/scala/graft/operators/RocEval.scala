package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Threshold-free classifier evaluation — exact ROC-AUC (the
  * Mann–Whitney U identity, with the standard tie correction) and
  * average precision (area under the precision–recall curve, the
  * step-function form), over integer-quantized scores. This is the
  * evaluation a quality-filter rollout runs BEFORE picking a
  * threshold (q129's confusion matrix and q136's conformal τ both
  * presume a cut point; AUC/AP rank the scorer itself).
  *
  * Reference seam: the reference stops at embedding inference
  * (`03-model-inference-on-chunks.py:131`); evaluating a filter
  * trained on those embeddings is the LLM-data-pipeline extension
  * (SURVEY §2.12, the q128–q137 supervised layer).
  *
  * Exactness: scores are [[LogReg]]'s hard-sigmoid integers in
  * [0, 2^10], so the evaluation first collapses the corpus to one
  * row per DISTINCT score value (≤ 1025 rows regardless of corpus
  * size — map-side combine does the reduction) and then works purely
  * on that level frame:
  *
  *  - AUC via pair counting over levels: for positive-level a and
  *    negative-level b, a.s > b.s contributes 2, a.s = b.s
  *    contributes 1 (the ½-per-tied-pair correction kept integer by
  *    counting HALVES) — `auc_num` = Σ pos_a·neg_b·(2|1), `auc_den`
  *    = 2·P·N, AUC = auc_num/auc_den exactly.
  *  - AP as Σ_t (ΔTP_t/P)·precision_t over distinct positive-bearing
  *    thresholds t (descending): each precision is one
  *    [[LogReg.fdiv]]-floored micro-quantized term (deterministic in
  *    both engines — exactly-rounded IEEE division), summed exactly.
  *
  * Scale shape: one corpus aggregation (shuffle of ≤1025 partial rows
  * per partition), then two non-equi self-joins of the level frame —
  * O(quantum²) work INDEPENDENT of corpus size, broadcast both sides.
  * No window functions (the suite-wide no-unpartitioned-window pin),
  * no driver collect.
  *
  * Headroom: auc_num ≤ 2·P·N < 2^63 for any P,N < 2^31; the AP term
  * 10^6·pos_t·TP≥t needs pos_t·TP≥t < ~9.2·10^12, i.e. P ≲ 3·10^6 —
  * past that, drop `ApQuantum` a decade (the [[LogReg]] headroom
  * note's pattern, one tier earlier).
  *
  * Degenerate inputs (empty holdout, single-class holdout) yield NULL
  * ratio columns via NULLIF denominators — explicitly, identically in
  * both engines — never a 0/0 NaN cast (the q129 acc_milli
  * discipline).
  */
object RocEval {

  /** Micro-quantum for the per-threshold AP precision terms. */
  val ApQuantum = 1000000L

  /** floor(a/b) as exactly-rounded IEEE division — [[LogReg.fdiv]]
    * lifted to columns; NULL propagates (NULLIF guards ride on b).
    */
  private def fdivC(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  private def nullIfZero(c: Column): Column = nullif(c, lit(0L))

  /** One-row summary of `scored` (an integer `scoreCol` plus 0/1
    * `yCol`): p_total, n_total, n_levels, auc_num, auc_den,
    * auc_milli, gini_milli (2·AUC−1), ap_milli.
    */
  def summary(scored: DataFrame, scoreCol: String, yCol: String): DataFrame = {
    val y = col(yCol).cast("long")
    // the corpus → level reduction: everything after this is
    // O(quantum), not O(rows)
    val levels = scored
      .groupBy(col(scoreCol).cast("long").as("s"))
      .agg(sum(y).as("pos"), sum(lit(1L) - y).as("neg"))
      // three consumers (totals, AUC pairs, AP thresholds) — persist
      // the ≤1025-row frame so the corpus aggregation runs once;
      // storage released by the caller's clearCache (repo convention)
      .persist()

    val tot = levels.agg(
      sum(col("pos")).cast("long").as("p_total"),
      sum(col("neg")).cast("long").as("n_total"),
      count(lit(1)).as("n_levels"))

    // AUC pair counting: a carries positives, b negatives; a.s >= b.s
    // keeps exactly the contributing pairs (2 per win, 1 per tie)
    val a = levels.select(col("s").as("sa"), col("pos"))
    val b = levels.select(col("s").as("sb"), col("neg"))
    val aucNum = a.join(broadcast(b), col("sa") >= col("sb"))
      .agg(coalesce(
        sum(col("pos") * col("neg") *
          when(col("sa") > col("sb"), 2L).otherwise(1L)),
        lit(0L)).cast("long").as("auc_num"))

    // AP: for each positive-bearing threshold t, TP≥t / (TP≥t + FP≥t)
    // micro-floored, weighted by pos_t
    val thr = levels.filter(col("pos") > 0L).select(col("s").as("st"), col("pos").as("pos_t"))
    val apTerms = thr.join(broadcast(levels), col("s") >= col("st"))
      .groupBy(col("st"), col("pos_t"))
      .agg(sum(col("pos")).as("tpge"), sum(col("neg")).as("fpge"))
      .select(fdivC(lit(ApQuantum) * col("pos_t") * col("tpge"),
        col("tpge") + col("fpge")).as("term"))
    val apNum = apTerms.agg(coalesce(sum(col("term")), lit(0L)).cast("long").as("ap_num"))

    tot.crossJoin(aucNum).crossJoin(apNum)
      .withColumn("auc_den", lit(2L) * col("p_total") * col("n_total"))
      .withColumn("auc_milli",
        fdivC(lit(1000L) * col("auc_num"), nullIfZero(col("auc_den"))))
      .withColumn("gini_milli",
        fdivC(lit(1000L) * (col("auc_num") - col("p_total") * col("n_total")),
          nullIfZero(col("p_total") * col("n_total"))))
      .withColumn("ap_milli",
        fdivC(col("ap_num"), nullIfZero(lit(1000L) * col("p_total"))))
      .select(col("p_total"), col("n_total"), col("n_levels"),
        col("auc_num"), col("auc_den"), col("auc_milli"),
        col("gini_milli"), col("ap_milli"))
  }

  /** DeLong et al. (1988) standard error of the AUC, via placement
    * values at score-LEVEL granularity: a positive at level s has
    * placement (2·neg<ₛ + neg₌ₛ) in 1/(2N) units — an exact integer —
    * and symmetrically for negatives; AUC is the pos-weighted
    * placement mean, Var(AUC) = S₁₀/P + S₀₁/N with S the weighted
    * sample variances. All placement sums are exact BIGINTs (headroom:
    * Σw·x² ≤ P·4N² — fine to ~10⁶ rows per class; past that the
    * level frame still fits but the squares need the double path one
    * tier earlier, the RocEval.ApQuantum note's pattern); the
    * variance assembly and the 1.96·se Wald band are fixed double
    * expressions identical in both engines. Returns one row:
    * (p_total, n_total, auc_milli, se_micro, lo_milli, hi_milli).
    *
    * Scale shape: the same corpus→level reduction as [[summary]]
    * (≤1025 levels), then one broadcast level×level cross join —
    * O(quantum²) independent of corpus size.
    */
  def delong(scored: DataFrame, scoreCol: String, yCol: String): DataFrame = {
    val y = col(yCol).cast("long")
    val levels = scored
      .groupBy(col(scoreCol).cast("long").as("s"))
      .agg(sum(y).as("pos"), sum(lit(1L) - y).as("neg"))
      .persist()
    val tot = levels.agg(
      sum(col("pos")).cast("long").as("p_total"),
      sum(col("neg")).cast("long").as("n_total"))
    val a = levels.select(col("s").as("sa"),
      col("pos").as("pa"), col("neg").as("na"))
    val pl = a.crossJoin(broadcast(levels))
      .groupBy(col("sa"), col("pa"), col("na"))
      .agg(sum(when(col("s") < col("sa"), col("neg")).otherwise(0L)).as("nl"),
        sum(when(col("s") > col("sa"), col("pos")).otherwise(0L)).as("pg"))
      .select(col("pa"), col("na"),
        (col("nl") * 2 + col("na")).as("x10"),
        (col("pg") * 2 + col("pa")).as("x01"))
    val sums = pl.agg(
      sum(col("pa") * col("x10")).as("swx10"),
      sum(col("pa") * col("x10") * col("x10")).as("sq10"),
      sum(col("na") * col("x01")).as("swx01"),
      sum(col("na") * col("x01") * col("x01")).as("sq01"))
    val m = tot.crossJoin(sums)
    val pd = col("p_total")
    val nd = col("n_total")
    val aucd = col("swx10").cast("double") / (lit(2.0) * nd * pd)
    // degenerate-class guard: a holdout with a single positive (or
    // single negative) would divide by (p−1)=0 → Infinity/NaN rather
    // than an honest "variance undefined". nullIfZero (the auc_milli
    // pattern above, NULLIF in the q219 oracle) makes se/bands NULL.
    val s10 = ((col("sq10").cast("double")
      - col("swx10").cast("double") * col("swx10") / pd)
      / nullIfZero(pd - lit(1L)) / (lit(2.0) * nd)) / (lit(2.0) * nd)
    val s01 = ((col("sq01").cast("double")
      - col("swx01").cast("double") * col("swx01") / nd)
      / nullIfZero(nd - lit(1L)) / (lit(2.0) * pd)) / (lit(2.0) * pd)
    val se = sqrt(s10 / pd + s01 / nd)
    m.select(pd, nd,
      fdivC(lit(1000L) * col("swx10"),
        nullIfZero(lit(2L) * pd * nd)).as("auc_milli"),
      floor(se * 1000000 + lit(0.5)).cast("long").as("se_micro"),
      floor((aucd - lit(1.96) * se) * 1000 + lit(0.5)).cast("long")
        .as("lo_milli"),
      floor((aucd + lit(1.96) * se) * 1000 + lit(0.5)).cast("long")
        .as("hi_milli"))
  }
}
