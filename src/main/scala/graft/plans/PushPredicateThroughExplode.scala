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
  /** Idempotent install into the session's experimental rules and
    * planner strategies (the custom as-of operator).
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(PushPredicateThroughExplode)) {
      spark.experimental.extraOptimizations = cur :+ PushPredicateThroughExplode
    }
    val cur2 = spark.experimental.extraOptimizations
    if (!cur2.contains(RewriteIntersectCount)) {
      spark.experimental.extraOptimizations = cur2 :+ RewriteIntersectCount
    }
    val cur3 = spark.experimental.extraOptimizations
    if (!cur3.contains(InferLevenshteinBand)) {
      spark.experimental.extraOptimizations = cur3 :+ InferLevenshteinBand
    }
    val cur4 = spark.experimental.extraOptimizations
    if (!cur4.contains(InferJaccardSizeBand)) {
      spark.experimental.extraOptimizations = cur4 :+ InferJaccardSizeBand
    }
    // AFTER the band rules: bands inject conjuncts first, then the
    // hoist extracts each side's heavy subtrees (incl. the bands' own)
    val cur5 = spark.experimental.extraOptimizations
    if (!cur5.contains(HoistJoinConditionSubexpressions)) {
      spark.experimental.extraOptimizations = cur5 :+ HoistJoinConditionSubexpressions
    }
    AsofJoinNative.installStrategy(spark)
  }
}
