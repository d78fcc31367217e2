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
}
