package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter 1969): blocked
  * candidate pairs scored by per-field agreement log-likelihood
  * weights. The entity-resolution primitive of data curation —
  * dedup ([[Dedup]]) collapses near-IDENTICAL rows; linkage finds
  * rows that are the SAME ENTITY under noisy fields (names, typos,
  * shifted balances) by weighing each field's evidence: agreement on
  * a discriminating field (high m, low u) adds ln(m/u), disagreement
  * adds ln((1−m)/(1−u)) — m = P(agree | match), u = P(agree |
  * non-match).
  *
  * Determinism: m/u are configured priors (the classic unsupervised
  * EM fit is a calibration concern, not a per-run one), so the weights
  * are DRIVER-computed integer micro-nats embedded as literals in both
  * the Spark plan and the oracle SQL — no transcendental is ever
  * evaluated by either engine, and scores are exact integer sums
  * (the [[Dsir]]/[[LogReg]] fixed-point discipline). Field agreement
  * predicates must themselves be cross-engine-exact: levenshtein
  * (both engines, q93 precedent), equality, and IEEE-exact arithmetic
  * comparisons qualify.
  *
  * Scale shape: candidate generation is an equi-join on the blocking
  * key — Σ_b n_b² comparisons, never n². Blocking keys must bound
  * block size (the q26 label-block discipline); for skewed or
  * low-recall single keys, run multiple passes with different keys
  * and union (standard multi-pass blocking) — each pass is the same
  * bounded equi-join. Scoring is a narrow projection on the pair
  * stream; classification thresholds are plain filters.
  */
object Linkage {

  /** Integer quantum for log-likelihood weights: micro-nats. */
  val Quantum = 1000000L

  private[graft] def micro(x: Double): Long =
    math.floor(math.log(x) * Quantum + 0.5).toLong

  /** Scalar twin of Spark's `levenshtein` (plain edit distance, unit
    * costs) for executor-side typed code (the streaming linkage
    * state function) — one distance contract, not two drifting ones.
    */
  def levenshteinScalar(a: String, b: String): Int = {
    if (a == null || b == null) return Int.MaxValue
    val (n, m) = (a.length, b.length)
    if (n == 0) return m
    if (m == 0) return n
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** One comparison field: output bit name, source column, agreement
    * predicate over (left, right), and the m/u priors.
    */
  final case class Field(
      name: String,
      col: String,
      agree: (Column, Column) => Column,
      m: Double,
      u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1 for a discriminating field, got m=$m u=$u")
    /** ln(m/u) in micro-nats (> 0). */
    def wAgree: Long = micro(m / u)
    /** ln((1−m)/(1−u)) in micro-nats (< 0). */
    def wDisagree: Long = micro((1 - m) / (1 - u))
  }

  /** Blocked pair stream with per-field agreement bits (`ag_<name>`)
    * and the integer Fellegi–Sunter score (`fs_score`). Pairs are
    * canonical (id_a < id_b within a block).
    */
  def fsPairs(
      df: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[Field]): DataFrame = {
    require(blockCols.nonEmpty, "linkage without blocking is n² — refuse")
    val a = df.alias("la")
    val b = df.alias("lb")
    val cond = blockCols.map(c => col(s"la.$c") === col(s"lb.$c")).reduce(_ && _) &&
      col(s"la.$idCol") < col(s"lb.$idCol")
    val joined = a.join(b, cond)
    val withBits = fields.foldLeft(joined) { (d, f) =>
      d.withColumn(s"ag_${f.name}",
        when(f.agree(col(s"la.${f.col}"), col(s"lb.${f.col}")), 1L).otherwise(0L))
    }
    val score = fields
      .map(f => when(col(s"ag_${f.name}") === 1L, lit(f.wAgree))
        .otherwise(lit(f.wDisagree)))
      .reduce(_ + _)
    withBits.withColumn("fs_score", score)
      .select(
        col(s"la.$idCol").as("id_a") +: col(s"lb.$idCol").as("id_b") +:
          fields.map(f => col(s"ag_${f.name}")) :+ col("fs_score"): _*)
  }

  /** Three-way FS decision on a score column (integer thresholds in
    * micro-nats): link / possible / nonlink.
    */
  def classify(score: Column, tLow: Long, tHigh: Long): Column = {
    require(tLow <= tHigh, s"tLow $tLow must be ≤ tHigh $tHigh")
    when(score >= tHigh, lit("link"))
      .when(score >= tLow, lit("possible"))
      .otherwise(lit("nonlink"))
  }

  /** SQL text of the score for the oracle: CASE per field over the
    * same integer weights (`agExprs` are the oracle's agreement
    * predicates, index-aligned with `fields`).
    */
  def fsScoreSql(fields: Seq[Field], agExprs: Seq[String]): String = {
    require(fields.length == agExprs.length)
    fields.zip(agExprs)
      .map { case (f, ag) =>
        s"(CASE WHEN $ag THEN ${f.wAgree} ELSE ${f.wDisagree} END)" }
      .mkString(" + ")
  }
}
