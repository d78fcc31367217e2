package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) regression over weighted bins —
  * the calibration step that turns a reliability table (q208) into a
  * monotone score→probability map (Zadrozny & Elkan 2002 use PAV; the
  * equivalent closed form used here is the minimax identity
  * fitted(i) = max_{j≤i} min_{k≥i} avg(y over bins j..k), Robertson
  * et al. 1988 §1.2).
  *
  * The minimax form instead of the PAV sweep because it is a PURE
  * JOIN/AGGREGATE expression over the bins: range averages are exact
  * integer division of range sums (2^-20 quantized), min/max over
  * exact integers — no data-dependent pooling loop, so any engine
  * replays it row-for-row (the repo's oracle discipline; a PAV sweep's
  * pool merging cannot be unrolled into SQL).
  *
  * Scale shape: every frame here is bins-sized, and the bin count is
  * a CONSTANT of the calibration design (a fixed bin width over a
  * bounded margin range — ~10 at the fixtures), not a function of
  * corpus size; the O(bins³) range/membership joins are O(1) in the
  * data. The corpus-sized work (scoring + binning) happens before
  * this operator. The non-equi joins are BNL over these constant
  * frames by construction.
  */
object Isotonic {

  /** 2^20 — the rate quantum: range rates land on integer multiples
    * of 2^-20, making min/max/fit exact on both engines. */
  val RateQ = 1048576L

  /** Input: one row per bin with an ordering column `x`, a weight
    * (count) column `w` > 0, and a positive-count column `p` with
    * 0 ≤ p ≤ w. Returns the input plus `fitted_q`: the isotonic rate
    * in 2^-20 units, non-decreasing in `x`.
    */
  def fit(bins: DataFrame, x: String, w: String, p: String): DataFrame = {
    val b = bins.select(col(x).as("x"),
      col(w).cast("long").as("w"), col(p).cast("long").as("p"))
    val ranges = b.as("j").join(b.as("k"), col("j.x") <= col("k.x"))
      .select(col("j.x").as("jx"), col("k.x").as("kx"))
    val rs = ranges
      .join(b, col("x") >= col("jx") && col("x") <= col("kx"))
      .groupBy(col("jx"), col("kx"))
      .agg(sum(col("p")).as("sp"), sum(col("w")).as("sw"))
      .select(col("jx"), col("kx"),
        expr(s"sp * $RateQ DIV sw").as("avg_q"))
    val mji = rs
      .join(b.select(col("x").as("i")),
        col("jx") <= col("i") && col("kx") >= col("i"))
      .groupBy(col("i"), col("jx")).agg(min(col("avg_q")).as("m"))
    val fitted = mji.groupBy(col("i")).agg(max(col("m")).as("fitted_q"))
    bins.join(fitted, col(x) === col("i")).drop("i")
  }
}
