package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite `size(array_intersect(a, b))` to the
  * native allocation-free merge-count
  * [[graft.functions.SortedIntersectCount]] whenever BOTH inputs are
  * syntactically `sort_array(array_distinct(…))` — the shape every
  * set-similarity verify stage in this library produces. The stock
  * plan builds a hash set AND materializes the full intersection
  * array per row pair only to read its length; the rewrite keeps the
  * count inside whole-stage codegen with zero allocation (measured
  * ≈2× on the q28-style verify loop — SortedIntersectCount scaladoc).
  * Library operators call the native function directly; this rule
  * extends the same plan to USER-written `size(array_intersect(…))`
  * queries for free.
  *
  * Correctness guards (all three required):
  *  - both inputs are provably sorted ascending + duplicate-free BY
  *    CONSTRUCTION (`SortArray(ArrayDistinct(_), true)`) — on
  *    arbitrary arrays the merge-count undercounts, so no attempt is
  *    made to "trust" bare attributes;
  *  - element type string or bigint with `containsNull = false`
  *    (the merge loop reads elements without null slots; Spark's
  *    split/hash produce non-null elements, which is where this
  *    shape arises);
  *  - modern `size(NULL) = NULL` semantics only
  *    (`legacySizeOfNull = false`): SortedIntersectCount is
  *    null-propagating, matching; under the legacy -1 convention the
  *    rewrite would change null behavior, so it declines.
  *
  * Installed by [[GraftOptimizations.install]] next to
  * [[PushPredicateThroughExplode]].
  */
object RewriteIntersectCount extends Rule[LogicalPlan] {

  private def sortedDistinct(e: Expression): Boolean = e match {
    case SortArray(ArrayDistinct(_), Literal(true, BooleanType)) => true
    case _ => false
  }

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, false) => true
    case ArrayType(LongType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(a, b), false)
        if sortedDistinct(a) && sortedDistinct(b) &&
          okType(a) && okType(b) && a.dataType == b.dataType =>
      graft.functions.SortedIntersectCount(a, b)
  }
}
