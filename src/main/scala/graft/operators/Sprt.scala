package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wald's sequential probability ratio test (Wald 1945) over ordered
  * Bernoulli trials, one test per arm: the cumulative log-likelihood
  * ratio walk  LLR_n = Σ step·(2·successes − n)  for the symmetric
  * simple-vs-simple test p₁ vs p₀ = 1−p₁, stopped at the first n
  * where |LLR| ≥ ln((1−β)/α). The increments and threshold are
  * INTEGER micro-nat literals ([[LlrStepMicro]], [[ThresholdMicro]])
  * — no ln() is evaluated at query time, so the walk is exact integer
  * algebra and bit-replayable by any engine (the repo's libm-drift
  * discipline: Spark's and DuckDB's ln may differ in the last ulp).
  *
  * Scale shape: the per-arm prefix sums are computed by the
  * GlobalOrder two-pass range-partitioned machinery over ONE global
  * sort (arm, ts, id) — a success running-count plus a rank zip —
  * then re-based per arm by subtracting the arm's first-row offsets
  * (one arm-sized groupBy). No unpartitioned window, and no per-arm
  * single task even when one arm dominates the corpus: the sequential
  * semantics ride the range partitioning, not a window. Stop
  * detection is an arm-sized min-struct aggregate, not a scan.
  */
object Sprt {

  /** ln(0.55/0.45)·10⁶, rounded — the per-trial LLR increment for the
    * symmetric test p₁ = 0.55 vs p₀ = 0.45. */
  val LlrStepMicro = 200671L

  /** ln((1−β)/α)·10⁶ = ln(19)·10⁶ at α = β = 0.05. */
  val ThresholdMicro = 2944439L

  /** Per-arm SPRT decisions. `succ` must be a boolean column; trials
    * are ordered by (`ts`, `id`) inside each arm — (`ts`, `id`) must
    * be unique per arm for the walk to be deterministic. Returns one
    * row per arm: (arm, decision ∈ accept_h1 | accept_h0 | continue,
    * n_stop, llr_micro) — the first-crossing state, or the final
    * state for arms that never cross.
    */
  def decide(
      df: DataFrame,
      armCol: String,
      tsCol: String,
      idCol: String,
      succ: Column,
      stepMicro: Long = LlrStepMicro,
      thresholdMicro: Long = ThresholdMicro): DataFrame = {
    val base = df.select(col(armCol).as("arm"), col(tsCol).as("us"),
      col(idCol).as("eid"),
      when(succ, lit(1)).otherwise(lit(0)).cast("decimal(38,0)").as("ind"))
    // one global sort; cum = inclusive success prefix, rk = global rank
    val cum = GlobalOrder.runningSum(base,
      Seq(col("arm"), col("us"), col("eid")), "ind", "cum")
    val rk = GlobalOrder.zipRank(cum, "rk")
    // per-arm offsets from the arm's FIRST row (min by the unique
    // (us, eid) order): prefix-before-arm for both counters
    val offs = rk.groupBy(col("arm")).agg(
      min(struct(col("us"), col("eid"),
        (col("cum") - col("ind")).as("c0"), (col("rk") - 1).as("r0"))).as("f"))
      .select(col("arm"), col("f.c0").as("c0"), col("f.r0").as("r0"))
    val walk = rk.join(offs, "arm").select(col("arm"),
      (col("rk") - col("r0")).as("idx"),
      (lit(stepMicro) * (lit(2) * (col("cum") - col("c0")).cast("long")
        - (col("rk") - col("r0")))).as("llr"))
    val crossed = walk.filter(abs(col("llr")) >= thresholdMicro)
      .groupBy(col("arm")).agg(min(struct(col("idx"), col("llr"))).as("s"))
      .select(col("arm"), col("s.idx").as("cidx"), col("s.llr").as("cllr"))
    val finals = walk.groupBy(col("arm"))
      .agg(max(struct(col("idx"), col("llr"))).as("s"))
      .select(col("arm"), col("s.idx").as("fidx"), col("s.llr").as("fllr"))
    finals.join(crossed, Seq("arm"), "left")
      .select(col("arm"),
        when(col("cidx").isNull, "continue")
          .when(col("cllr") > 0, "accept_h1").otherwise("accept_h0")
          .as("decision"),
        coalesce(col("cidx"), col("fidx")).as("n_stop"),
        coalesce(col("cllr"), col("fllr")).as("llr_micro"))
  }
}
