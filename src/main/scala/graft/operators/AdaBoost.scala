package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Discrete AdaBoost over decision stumps — the boosting member of
  * the supervised family ([[LogReg]] GD, [[NaiveBayes]] generative,
  * [[DecisionTree]] greedy, this one additive), with every weight
  * kept an exact integer so all three rounds replay value-for-value
  * in oracle SQL.
  *
  * Stumps: h(x) = p if xq_j ≤ t else −p over the [[DecisionTree]]
  * feature quanta and threshold grid, polarity p ∈ {+1, −1}. Each
  * round picks the stump minimizing the weighted error
  * Σ_{h≠y} w (tie-break err, dim, threshold, polarity).
  *
  * Exact weight recurrence: with the classical unnormalized update
  * (w·(W−err) on mistakes, w·err on hits) the new total is EXACTLY
  * W' = 2·err·(W−err), so renormalizing to total ≈ n·2^16 reduces to
  *   w' = (w · 2^16 · n) idiv (2·err)        on mistakes,
  *   w' = (w · 2^16 · n) idiv (2·(W−err))    on hits
  * — one truncating integer division (Spark DIV ≡ DuckDB // on
  * non-negatives), no floats anywhere in training. Headroom:
  * w ≤ W ≈ n·2^16 (+n truncation slack), so the numerator is under
  * n²·2^33 < 2^63 for n up to ~3·10^4 rows; larger corpora lower the
  * 2^16 weight quantum (the [[LogReg]] headroom pattern).
  *
  * The ONLY libm call is one ln per round for the vote weight
  * α_r = ½·ln((W−err)/err), r4-snapped ([[NaiveBayes]] discipline);
  * margins are then exact BIGINT sums Σ α_r·h_r(x) and the sign is
  * engine-independent.
  *
  * Scale shape per round: one distributed (dim, threshold) weighted-
  * count aggregation (candidate frame is grid-sized, not
  * corpus-sized), one argmin row to the driver, one narrow per-row
  * weight map keyed by the chosen dim. Weights live in a (id, w)
  * frame — never on the driver.
  */
object AdaBoost {

  /** Weight quantum 2^16. */
  val WScale = 65536L

  /** One boosting round: the stump, its polarity (+1/−1), the
    * weighted error and total at selection time, and the r4-snapped
    * half-log vote weight.
    */
  final case class Round(dim: Int, thr: Long, pol: Int, err: Long, w: Long, alphaQ: Long)

  final case class Model(rounds: Seq[Round])

  private def quantized(embs: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame =
    embs.select(col(idCol), col(labelCol).as("lbl"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col(idCol),
        when(col("lbl") === 0, 1L).otherwise(-1L).as("y"),
        col("pos"),
        floor(col("v").cast("double") * LogReg.FeatScale).cast("long").as("xq"))

  /** y-vs-stump disagreement for polarity +1 at (pos ≤ t). */
  private def misPlus: Column =
    when(col("xq") <= col("t"), lit(1L)).otherwise(lit(-1L)) =!= col("y")

  /** Fit `iterations` rounds on (vecCol, labelCol == 0). */
  def fit(embs: DataFrame, idCol: String, vecCol: String, labelCol: String,
      iterations: Int): Model = {
    require(iterations >= 1)
    val spark = embs.sparkSession
    import spark.implicits._
    val quant = quantized(embs, idCol, vecCol, labelCol)
      .transform(graft.operators.Iterate.truncate) // 3 rounds re-read rows, not the scan plan
    val n = embs.count()
    // the scaladoc headroom proof (w·2^16·n ≤ n²·2^33 < 2^63) is only
    // valid to ~3·10^4 rows at this weight quantum — ENFORCED, not
    // assumed (larger corpora lower WScale)
    require(n <= 30000L,
      s"n=$n exceeds the 2^16-quantum weight headroom (max 30000 rows); " +
        "lower the weight scale for larger corpora")
    val th = DecisionTree.Thresholds.toDF("t")
    var weights = embs.select(col(idCol), lit(WScale).as("w"))
      .transform(graft.operators.Iterate.truncate)
    val rounds = (0 until iterations).map { _ =>
      val wTot = weights.agg(sum($"w")).head.getLong(0)
      val errs = quant.join(weights, idCol)
        .crossJoin(broadcast(th))
        .groupBy($"pos", $"t")
        .agg(sum(when(misPlus, col("w")).otherwise(0L)).as("errp"))
      // both polarities: p=0 → err = errp; p=1 → err = W − errp
      val best = errs
        .select($"pos", $"t", lit(0).as("p"), $"errp".as("err"))
        .unionAll(errs.select($"pos", $"t", lit(1).as("p"),
          (lit(wTot) - $"errp").as("err")))
        .orderBy($"err".asc, $"pos".asc, $"t".asc, $"p".asc)
        .limit(1).head()
      val (j, t, p, err) =
        (best.getInt(0), best.getLong(1), best.getInt(2), best.getLong(3))
      require(err > 0L && err < wTot,
        s"degenerate round: err=$err of $wTot (perfect or inverted stump)")
      val alphaQ = math.floor(
        math.log((wTot - err).toDouble / err.toDouble) * 5000.0 + 0.5).toLong
      // update against the CHOSEN stump: mis = (h(x) != y)
      val feat = quant.filter($"pos" === j)
        .select(col(idCol), $"y",
          (when($"xq" <= t, lit(1L)).otherwise(lit(-1L)) *
            lit(if (p == 0) 1L else -1L)).as("h"))
      weights = weights.join(feat, idCol)
        .select(col(idCol),
          when($"h" =!= $"y",
            expr(s"w * ${WScale * n} DIV ${2L * err}"))
            .otherwise(expr(s"w * ${WScale * n} DIV ${2L * (wTot - err)}"))
            .as("w"))
        .transform(graft.operators.Iterate.truncate)
      Round(j, t, if (p == 0) 1 else -1, err, wTot, alphaQ)
    }
    Model(rounds)
  }

  /** Score every row: (id, y, margin, pred) with margin the exact
    * BIGINT Σ α_r·h_r(x) and pred = +1 iff margin > 0 (the margin
    * and the model parameters are value-checked by the oracle).
    */
  def score(embs: DataFrame, idCol: String, vecCol: String, labelCol: String,
      m: Model): DataFrame = {
    def xqAt(dim: Int) =
      floor(element_at(col(vecCol), dim + 1).cast("double") * LogReg.FeatScale)
        .cast("long")
    val margin = m.rounds.map { r =>
      when(xqAt(r.dim) <= r.thr, lit(r.pol.toLong)).otherwise(lit(-r.pol.toLong)) *
        lit(r.alphaQ)
    }.reduce(_ + _)
    embs.select(col(idCol),
        when(col(labelCol) === 0, 1L).otherwise(-1L).as("y"),
        margin.as("margin"))
      .withColumn("pred", when(col("margin") > 0, 1L).otherwise(-1L))
      .orderBy(col(idCol))
  }
}
