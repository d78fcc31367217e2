package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §7.2(6)): push element-level predicates
  * through `explode` into an `array_filter` on the generator input —
  * rows that would be filtered immediately after generation are never
  * generated. The chunk pipeline's `length(chunk) > 50` post-explode
  * filter (the reference hard-codes it inside the chunk fn,
  * 02-parallel-ocr-with-ray.py:230) is the motivating shape; Catalyst
  * has no such rewrite of its own.
  *
  * Correctness guards:
  *  - only plain `Explode` — under `posexplode` the ordinal would be
  *    renumbered by pre-filtering (wrong), and under `outer` explode
  *    an array whose elements are all filtered out would yield one
  *    null row instead of zero rows (wrong);
  *  - only deterministic conjuncts whose references are exactly the
  *    single generator output attribute;
  *  - null semantics match: a filtered-out null element produces no
  *    row either way (Filter drops null-valued predicates, and
  *    ArrayFilter's lambda keeps only true).
  *
  * Install via [[GraftOptimizations.install]]
  * (`spark.experimental.extraOptimizations` — the public injection
  * point for third-party rules) or through GraftExtensions.
  */
object PushPredicateThroughExplode extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        g @ Generate(Explode(arr), _, false, _, out, _)) if out.size == 1 =>
      val elem = out.head
      val (pushable, rest) = splitConjuncts(cond).partition { p =>
        p.deterministic && p.references.nonEmpty &&
          p.references.subsetOf(AttributeSet(elem))
      }
      if (pushable.isEmpty) f
      else {
        val x = NamedLambdaVariable("x", elem.dataType, elem.nullable)
        val body = pushable.reduce(And).transform {
          case a: Attribute if a.semanticEquals(elem) => x
        }
        val filtered = ArrayFilter(arr, LambdaFunction(body, Seq(x)))
        val newGen = g.copy(generator = Explode(filtered))
        rest.reduceOption(And).map(Filter(_, newGen)).getOrElse(newGen)
      }
  }
}

object GraftOptimizations {
  /** THE optimizer-rule list, in application order — the single
    * source of truth behind both injection paths ([[install]] for a
    * live session, `GraftExtensions` for `spark.sql.extensions`
    * users), so neither can run one rule short of the other. Order
    * matters at the tail: the band rules inject their conjuncts
    * first, then [[HoistJoinConditionSubexpressions]] extracts each
    * side's heavy subtrees (including the bands' own halves).
    */
  val rules: Seq[org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] = Seq(
    PushPredicateThroughExplode,
    RewriteIntersectCount,
    InferLevenshteinBand,
    InferJaccardSizeBand,
    HoistJoinConditionSubexpressions)

  /** Idempotent install into the session's experimental rules and
    * planner strategies (the custom as-of operator).
    */
  def install(spark: SparkSession): Unit = {
    rules.foreach { r =>
      val cur = spark.experimental.extraOptimizations
      if (!cur.contains(r)) {
        spark.experimental.extraOptimizations = cur :+ r
      }
    }
    AsofJoinNative.installStrategy(spark)
  }
}
