package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — closed-form training
  * (one aggregation pass builds the whole model), Laplace add-one
  * smoothing, log-space scoring in r4 fixed point so the DuckDB
  * oracle reproduces every score BIGINT-for-BIGINT.
  *
  * Reference seam: the reference pipeline stops at embedding
  * inference (`03-model-inference-on-chunks.py:131`); a corpus-prior
  * language/quality classifier is the LLM-data-pipeline extension
  * (SURVEY §2.12) — the classical fastText-adjacent baseline a
  * curation stack wants next to [[LogReg]].
  *
  * Exactness (the q96 libm discipline, hardened one step):
  *  - every probability is an exact rational — prior n_c/N,
  *    likelihood (c_wc+1)/(tot_c+V) — whose DOUBLE image is the
  *    IEEE-exact quotient of two exact longs, identical across
  *    engines;
  *  - each ln is taken ONCE per model cell and immediately rounded
  *    to r4 fixed point (floor(ln·10^4 + 1/2) as BIGINT). From there
  *    scoring is pure integer algebra: score(d,c) = lnq(prior_c) +
  *    Σ_w count_dw·lnq(w|c), so sums commute and the argmax (ties
  *    broken by label order) is engine-independent. Rounding each ln
  *    BEFORE summing — rather than q96's round-after-average — is
  *    what makes scores exactly reproducible instead of
  *    reproducible-up-to-ulp.
  *
  * Scale shape: the model is |vocab|·|classes| cells — built by
  * aggregations that shuffle on (class, word), never on rows. The
  * scoring join broadcasts the model table (a corpus vocabulary times
  * a handful of labels fits every executor; drop the hint for
  * million-class regimes) against the per-document word counts, then
  * one (doc, class)-keyed aggregate and a per-document window pick
  * the argmax. Nothing materializes per-row state on the driver.
  */
object NaiveBayes {

  /** r4 fixed point: ln values live in units of 10^-4. */
  val LnScale = 10000L

  /** floor(ln(num/den)·10^4 + 1/2) as a long — the ONE libm call per
    * model cell, snapped to r4 so both engines agree bit-for-bit.
    */
  private def lnQ(num: Column, den: Column): Column =
    floor(log(num.cast("double") / den.cast("double")) * LnScale + lit(0.5))
      .cast("long")

  /** Self-train on (textCol, labelCol) and score every row; returns
    * (idCol, labelCol, pred_<labelCol>, score) with `score` the
    * winning class's fixed-point log-posterior. Rows with no tokens
    * drop (no evidence, mirrored by the oracle's inner joins).
    */
  def classify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String): DataFrame = {
    // ONE tokenize pass: per-document word counts; the (class, word)
    // model counts roll up from dt + the doc→label table instead of
    // re-exploding the corpus a second time. dt feeds five consumers
    // (model grid, vocab, totals, scoring) — materialize it, or each
    // re-runs the explode lineage (pinned by PlanAuditSpec: one
    // Generate in the executed plan)
    val dt = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("cdw"))
      .transform(graft.operators.Iterate.truncate)
    val labels = docs.select(col(idCol), col(labelCol).as("c"))
    val wc = dt.join(labels, idCol)
      .groupBy(col("c"), col("w")).agg(sum(col("cdw")).as("cnt"))
    val tot = wc.groupBy(col("c")).agg(sum(col("cnt")).as("tot"))
    val vocab = wc.select(col("w")).distinct()
    val vv = vocab.agg(count(lit(1)).as("v"))
    val pri = docs.groupBy(col(labelCol).as("c")).agg(count(lit(1)).as("nc"))
    val nn = docs.agg(count(lit(1)).as("n"))

    // model grid: every (class, vocab word) cell, absent counts = 0
    val grid = tot.crossJoin(vocab).crossJoin(broadcast(vv))
      .join(wc, Seq("c", "w"), "left")
      .select(col("c"), col("w"),
        lnQ(coalesce(col("cnt"), lit(0L)) + 1L, col("tot") + col("v"))
          .as("lnq"))
    val priQ = pri.crossJoin(broadcast(nn))
      .select(col("c"), lnQ(col("nc"), col("n")).as("lnp"))

    val scored = dt.join(broadcast(grid), "w")
      .groupBy(col(idCol), col("c"))
      .agg(sum(col("cdw") * col("lnq")).as("ll"))
      .join(broadcast(priQ), "c")
      .select(col(idCol), col("c"), (col("ll") + col("lnp")).as("score"))

    val win = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("c").asc)
    val pred = scored
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col(idCol), col("c").as(s"pred_$labelCol"), col("score"))

    docs.select(col(idCol), col(labelCol))
      .join(pred, idCol)
      .select(col(idCol), col(labelCol), col(s"pred_$labelCol"), col("score"))
  }
}
