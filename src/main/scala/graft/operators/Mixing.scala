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
}
