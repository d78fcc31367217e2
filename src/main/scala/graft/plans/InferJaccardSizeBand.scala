package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: infer the size-ratio band implied by a Jaccard
  * threshold. For duplicate-free sets,
  * `|A∩B| / |A∪B| >= t` implies `t·|A| <= |B| AND t·|B| <= |A|`
  * (the intersection is at most the smaller set, the union at least
  * the larger: J >= t ⟹ min >= t·max) — so the cheap cardinality
  * band is injected as an extra conjunct, which Catalyst can push
  * below the join that produced the (A, B) pair and prune candidates
  * BEFORE the O(|A|+|B|) set arithmetic runs. This surfaces
  * [[graft.operators.PrefixJoin]]'s size prune for USER-written
  * similarity predicates of the form
  * `size(array_intersect(a, b)) / size(array_union(a, b)) >= t`.
  *
  * Correctness: the injection is an EQUIVALENCE, not just an
  * implication — P ⟹ band means And(band, P) ≡ P in three-valued
  * logic, so the rewrite is safe in any Boolean context including
  * NOT. Case walk: P true ⟹ band true (the implication); P false ⟹
  * And(_, false) = false for band ∈ {true, false, null}; P null ⟹
  * either an input array is null (size(null) = null ⟹ band null,
  * And(null, null) = null) or both arrays are empty (0/0 divides to
  * null; band is t·0 <= 0 = true, And(true, null) = null). Under
  * ANSI mode the 0/0 case throws instead of nulling — and since the
  * band is TRUE exactly there, the user predicate is still evaluated
  * and the error is preserved, never short-circuited away.
  *
  * Guards (all required):
  *  - both arrays are duplicate-free BY CONSTRUCTION
  *    (`array_distinct(…)`, optionally `sort_array`-wrapped — the
  *    shape every set-similarity stage produces). On arrays with
  *    duplicates the band is WRONG: raw sizes overcount the set
  *    cardinalities the Jaccard actually compares ([x,x,…,x] vs [x]
  *    has J = 1 but fails t·size(a) <= size(b)), so bare attributes
  *    are never trusted;
  *  - the intersection and union are over the SAME pair (either
  *    order — both operations are symmetric in cardinality);
  *  - modern `size(NULL) = NULL` semantics only (the `Size` node
  *    carries `legacySizeOfNull` at construction; under the legacy
  *    −1 convention a null input makes the user predicate evaluate
  *    (−1)/(−1) = 1.0 while the band would read −t <= −1 = false —
  *    divergent, so the rule declines by matching `Size(_, false)`);
  *  - t is a foldable numeric literal in (0, 1] — outside that range
  *    the band adds nothing (t <= 0 is vacuous, t > 1 unsatisfiable);
  *  - both array expressions are deterministic (they are duplicated
  *    into the band conjunct);
  *  - idempotent: a band already present (semantically) is not
  *    re-added, so the optimizer's fixed-point iteration terminates.
  *
  * Also matches the post-[[RewriteIntersectCount]] shape where the
  * numerator is already a [[graft.functions.SortedIntersectCount]] —
  * the two rules share a batch, so either order of firing works.
  *
  * Installed by [[GraftOptimizations.install]].
  */
object InferJaccardSizeBand extends Rule[LogicalPlan] {

  /** Strip numeric casts (type coercion wraps int sizes for the
    * double division).
    */
  private def strip(e: Expression): Expression = e match {
    case Cast(c, _: NumericType, _, _) => strip(c)
    case other => other
  }

  /** Duplicate-free by construction. */
  private def distinctSet(e: Expression): Boolean = e match {
    case ArrayDistinct(_) => true
    case SortArray(inner, _) => distinctSet(inner)
    case _ => false
  }

  private def interOf(e: Expression): Option[(Expression, Expression)] =
    strip(e) match {
      case Size(ArrayIntersect(a, b), false) => Some((a, b))
      case graft.functions.SortedIntersectCount(a, b) => Some((a, b))
      case _ => None
    }

  private def unionOf(e: Expression): Option[(Expression, Expression)] =
    strip(e) match {
      case Size(ArrayUnion(a, b), false) => Some((a, b))
      case _ => None
    }

  private def samePair(p1: (Expression, Expression),
      p2: (Expression, Expression)): Boolean =
    (p1._1.semanticEquals(p2._1) && p1._2.semanticEquals(p2._2)) ||
      (p1._1.semanticEquals(p2._2) && p1._2.semanticEquals(p2._1))

  private def okT(e: Expression): Option[Double] = e match {
    case Literal(v: Double, DoubleType) if v > 0.0 && v <= 1.0 => Some(v)
    case Literal(d: Decimal, _: DecimalType)
        if d.toDouble > 0.0 && d.toDouble <= 1.0 => Some(d.toDouble)
    case _ => None
  }

  /** t·size(x) <= size(y), doubles. */
  private def half(t: Double, x: Expression, y: Expression): Expression =
    LessThanOrEqual(
      Multiply(Literal(t, DoubleType), Cast(Size(x, false), DoubleType)),
      Cast(Size(y, false), DoubleType))

  /** The set whose raw size an expression measures, when it is
    * `size(X)` over a distinct-by-construction X (the CONTAINMENT
    * denominator shape `size(array_intersect(A,B)) / size(A)`). */
  private def sizeOf(e: Expression): Option[Expression] = strip(e) match {
    case Size(x, false) => Some(x)
    case _ => None
  }

  private def bandFor(cmp: Expression): Option[Expression] = {
    val parts = cmp match {
      case GreaterThanOrEqual(Divide(i, u, _), t) => Some((i, u, t))
      case GreaterThan(Divide(i, u, _), t) => Some((i, u, t))
      case LessThanOrEqual(t, Divide(i, u, _)) => Some((i, u, t))
      case LessThan(t, Divide(i, u, _)) => Some((i, u, t))
      case _ => None
    }
    parts.flatMap { case (i, u, tExpr) =>
      val jaccard = for {
        (a, b) <- interOf(i)
        pu <- unionOf(u)
        if samePair((a, b), pu)
        if distinctSet(a) && distinctSet(b)
        if a.deterministic && b.deterministic
        t <- okT(tExpr)
      } yield And(half(t, a, b), half(t, b, a))
      // containment |A∩B|/|A| >= t ⟹ t·|A| <= |B| (the intersection is
      // at most the OTHER set): one-sided band, same null/ANSI walk —
      // X empty makes the band trivially true, so the 0/0 row still
      // evaluates (and errors/nulls) exactly like stock
      lazy val containment = for {
        (a, b) <- interOf(i)
        x <- sizeOf(u)
        other <- if (x.semanticEquals(a)) Some(b)
          else if (x.semanticEquals(b)) Some(a) else None
        if distinctSet(a) && distinctSet(b)
        if a.deterministic && b.deterministic
        t <- okT(tExpr)
      } yield half(t, x, other)
      jaccard.orElse(containment)
    }
  }

  private def inject(cond: Expression): Expression = {
    def already(band: Expression): Boolean =
      cond.find(_.semanticEquals(band)).isDefined
    cond.transformUp {
      case p => bandFor(p) match {
        case Some(band) if !already(band) => And(band, p)
        case _ => p
      }
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
