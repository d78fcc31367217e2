package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: infer the length-band predicate implied by an
  * edit-distance threshold. `levenshtein(a, b) <= k` implies
  * `abs(length(a) - length(b)) <= k` (each insertion/deletion moves
  * the length by one), so the cheap band test is injected as an
  * extra conjunct — which Catalyst can then push to the scans and
  * (on a fuzzy join) evaluate BEFORE the O(|a|·|b|) dynamic program,
  * the q93/q141 candidate-pruning shape surfaced automatically for
  * USER-written fuzzy predicates.
  *
  * Correctness: the injection is an EQUIVALENCE, not just an
  * implication — P ⟹ band means And(band, P) ≡ P in three-valued
  * logic (null inputs null out both sides identically) — so the
  * rewrite is safe in any Boolean context, including under NOT.
  *
  * Guards:
  *  - only the 2-argument levenshtein: the 3-argument thresholded
  *    form returns −1 above its threshold, which breaks the
  *    implication (−1 <= k passes rows the band may reject);
  *  - k must be a non-negative int/bigint literal (a negative k is
  *    an always-false predicate — leave it alone);
  *  - idempotent: a band already present (semantically) in the
  *    condition is not re-added, so the optimizer's fixed-point
  *    iteration terminates.
  *
  * Installed by [[GraftOptimizations.install]].
  */
object InferLevenshteinBand extends Rule[LogicalPlan] {

  private def okK(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v >= 0
    case Literal(v: Long, LongType) => v >= 0
    case _ => false
  }

  /** abs(length(a) − length(b)) cast to k's type. */
  private def bandExpr(a: Expression, b: Expression, k: Expression): Expression = {
    val diff = Abs(Subtract(Length(a), Length(b)))
    if (k.dataType == IntegerType) diff else Cast(diff, k.dataType)
  }

  private def inject(cond: Expression): Expression = {
    def already(band: Expression): Boolean =
      cond.find(_.semanticEquals(band)).isDefined
    cond.transformUp {
      case p @ LessThanOrEqual(Levenshtein(a, b, None), k) if okK(k) =>
        val band = LessThanOrEqual(bandExpr(a, b, k), k)
        if (already(band)) p else And(band, p)
      case p @ LessThan(Levenshtein(a, b, None), k) if okK(k) =>
        val band = LessThan(bandExpr(a, b, k), k)
        if (already(band)) p else And(band, p)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = inject(cond)
      if (rewritten.fastEquals(cond)) f else f.copy(condition = rewritten)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = inject(cond)
      if (rewritten.fastEquals(cond)) j else j.copy(condition = Some(rewritten))
  }
}
