package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain mixing for training corpora: subsample each stratum (source,
  * language, domain) at its own rate to hit a target mixture — the
  * curation step that turns "whatever the crawl yielded" into the
  * weighted recipe a training run actually consumes.
  *
  * The keep decision is DETERMINISTIC — `id mod granularity` against a
  * per-stratum cutoff — not RNG-based like `DataFrameStatFunctions
  * .sampleBy`: the same corpus and rates always select the same rows,
  * so a mixture is reproducible across runs/engines and auditable by
  * any SQL engine (the q62 oracle). With ids dense or hashed, the
  * realized rate converges on the target at 1/granularity resolution.
  *
  * Scale shape (100 TB): a literal CASE over the stratum column — a
  * narrow codegen'd filter at the scan, no shuffle, no driver state;
  * rates for thousands of strata would move to a broadcast-joined
  * rates table, same plan shape minus the literal folding.
  */
object Mixing {

  /** Keep predicate: `pmod(id, granularity) < rate(stratum) ·
    * granularity`. Strata absent from `rates` are DROPPED (rate 0) —
    * mixture recipes are allowlists.
    */
  def keepExpr(
      idCol: Column,
      strataCol: Column,
      rates: Map[String, Double],
      granularity: Int = 1000): Column = {
    require(granularity > 0, "granularity must be positive")
    require(rates.values.forall(r => r >= 0 && r <= 1), "rates must be in [0, 1]")
    // round, don't truncate: 0.29 * 1000 is 289.999… in IEEE double,
    // and .toInt would silently under-sample the stratum by one slot
    val cutoff = rates.foldLeft(lit(0)) { case (acc, (stratum, rate)) =>
      when(strataCol === stratum,
        lit(math.round(rate * granularity).toInt)).otherwise(acc)
    }
    pmod(idCol, lit(granularity)) < cutoff
  }

  /** `df` subsampled to the mixture: one row kept per the stratum's
    * rate, deterministically in `idCol`.
    */
  def sampleStrata(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      granularity: Int = 1000): DataFrame =
    df.filter(keepExpr(col(idCol), col(strataCol), rates, granularity))

  /** Temperature-scaled mixture weights (the multilingual/Gopher
    * recipe, Conneau & Lample 2019 §3.1; Rae et al. 2021 Table A3):
    * w_d = p_d^τ / Σ_e p_e^τ over the empirical stratum shares p_d.
    * τ = 1 reproduces the corpus as-is; τ → 0 approaches uniform;
    * τ ∈ (0,1) upweights the tail — the standard fix for
    * head-language/domain dominance. Emits per stratum: `n_docs`, the
    * exact share `p`, the r4-rounded weight `w`, and the integer
    * per-epoch allocation `alloc` out of `epochSize` (floor(w·K+0.5)
    * on the ROUNDED w, so both engines allocate identically — pow()
    * is the one non-exact op here and r4 absorbs its ulp).
    *
    * Scale shape: one count-by-stratum scan (map-side partials, ≤
    * |strata| rows), then arithmetic on the tiny frame — the recipe
    * table is what feeds [[sampleStrata]]'s rates.
    *
    * Accepted cross-engine float caveat (same class as the ln() cases
    * in [[graft.operators.Dsir]], called out here for the audit
    * trail): z = Σ pow(n_d, τ) is a DOUBLE sum whose partial-
    * aggregation order differs between Spark layouts and DuckDB, so —
    * unlike the repo's quantize-then-sum integer discipline — ulp
    * noise enters BEFORE the r4 rounding, and a weight within ~1 ulp
    * of a 1e-4 boundary could round differently cross-engine. The
    * exposure is bounded by |strata| (a handful of rows, each a
    * pow-of-integer) and has never fired in the gate; an engine
    * needing hard determinism here should sum z on the driver from
    * the collected ≤|strata| counts in a fixed order and divide by
    * the one literal.
    */
  def temperatureWeights(
      df: DataFrame,
      strataCol: String,
      tau: Double,
      epochSize: Long): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    require(epochSize > 0, "epochSize must be positive")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum("n_docs").as("n_tot"),
      sum(pow(col("n_docs").cast("double"), lit(tau))).as("z"))
    val r4 = graft.functions.TextFunctions.r4 _
    counts.crossJoin(broadcast(tot))
      .select(
        col(strataCol),
        col("n_docs"),
        r4(col("n_docs").cast("double") / col("n_tot").cast("double")).as("p"),
        r4(pow(col("n_docs").cast("double"), lit(tau)) / col("z")).as("w"))
      .withColumn("alloc",
        floor(col("w") * epochSize + 0.5).cast("long"))
  }
}
