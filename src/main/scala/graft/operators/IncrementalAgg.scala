package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern:
  * keep per-key MERGEABLE STATE (n, sum, sumsq), fold each new batch
  * into it, and finalize mean/variance on read. At 100 TB the
  * alternative is re-aggregating the full history every refresh;
  * mergeable state makes the refresh cost proportional to the DELTA.
  *
  * count/sum/min/max merge trivially; the value here is the SECOND
  * moment: variance is not mergeable as a result, but is as raw
  * moments — var_samp = (sumsq − sum²/n) / (n−1) computes exactly
  * from summed state, so incremental stddev EQUALS batch stddev
  * (q70's oracle proves it against DuckDB's stddev_samp over the
  * unsplit history).
  *
  * The raw-moment form trades the numerical robustness of a running
  * Welford/Chan update for exact mergeability with plain SUMs; in
  * double it loses precision only when stddev/mean < ~1e-6 — metric
  * streams (latencies, prices, scores) are orders of magnitude away.
  */
object IncrementalAgg {

  /** Per-key moment state of one batch: (keys..., n, s1, s2). */
  def momentsState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(col(valueCol)).as("n"),
        sum(col(valueCol).cast("double")).as("s1"),
        sum(col(valueCol).cast("double") * col(valueCol).cast("double")).as("s2"))

  /** Merge any number of states: moments add per key. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"), sum(col("s2")).as("s2"))
  }

  /** Finalize state into (keys..., n, mean, var_samp, stddev_samp);
    * keys with n < 2 report null variance (the SQL convention).
    */
  def finalize(state: DataFrame, keys: Seq[String]): DataFrame = {
    val mean = col("s1") / col("n")
    // clamped at zero: for a constant-valued key the raw-moment form
    // can cancel to a tiny NEGATIVE (e.g. three 0.1s → −1.7e-18),
    // which sqrt() would turn into NaN while batch STDDEV_SAMP says 0
    val varS = when(col("n") < 2, lit(null).cast("double"))
      .otherwise(greatest(
        (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1),
        lit(0.0)))
    state.select(
      keys.map(col) ++ Seq(
        col("n"),
        mean.as("mean"),
        varS.as("var_samp"),
        sqrt(varS).as("stddev_samp")): _*)
  }

  // ------------------------------------------------------------------
  // Distinct counts as maintainable state (the sketch extension):
  // COUNT(DISTINCT) is famously not incrementally maintainable as a
  // result (a delta can't tell whether its keys are new), but HLL
  // REGISTERS are — element-wise max is a commutative idempotent
  // merge, so the maintained view equals the one-shot sketch over the
  // unsplit history (HyperLogLogSpec's monoid property, lifted to the
  // view-maintenance discipline of this module).

  /** Per-key distinct-count register state of one batch:
    * (keys..., regs).
    */
  def distinctState(df: DataFrame, keys: Seq[String], keyCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.HyperLogLog.sketch(col(keyCol)).as("regs"))

  /** Merge distinct states: per key, element-wise max over the
    * register arrays (a pure-Catalyst fold — state counts per key are
    * view-maintenance-small, typically old ⊕ delta).
    */
  def mergeDistinct(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    val zero = typedlit(Seq.fill(graft.functions.HyperLogLog.M)(0))
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(aggregate(collect_list(col("regs")), zero,
        (acc, r) => zip_with(acc, r, (a, b) => greatest(a, b))).as("regs"))
  }

  /** Finalize distinct state into (keys..., n_distinct_est). */
  def finalizeDistinct(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) :+
      graft.functions.HyperLogLog.estimate(col("regs")).as("n_distinct_est"): _*)
}
