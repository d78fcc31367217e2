package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: hoist EXPENSIVE single-side subexpressions out of
  * a join condition into Projects under the join, so they are
  * computed once per input ROW instead of once per candidate PAIR.
  *
  * The motivating shape is a user-written similarity join:
  * `a JOIN b ON ... size(array_intersect(tok(ta), tok(tb))) / ... >= t`
  * where `tok(x) = array_distinct(filter(split(trim(x)), …))`. The
  * tokenization of each side references only that side, but sitting
  * inside the join condition Catalyst evaluates it per pair — a
  * 1000-row block join tokenizes each document ~1000 times. Hoisting
  * `tok(ta)` into a Project under the left child makes it a per-row
  * column; the condition then just reads the attribute (measured on
  * q345: 6.6 s → ~1 s at sf0.1). This is the logical-plan analogue
  * of PrefixJoin's build-the-token-table-first discipline, applied
  * automatically to user predicates. Trade: the hoisted value flows
  * through the join input (bigger rows through the exchange) in
  * exchange for O(rows) instead of O(pairs) evaluation — why only
  * provably expensive expressions are hoisted.
  *
  * Guards:
  *  - only deterministic subexpressions whose references sit entirely
  *    in one child;
  *  - only MAXIMAL such subexpressions (found top-down — nothing is
  *    hoisted twice, and a cheap wrapper over an expensive core, like
  *    `0.6 * size(tok(ta))`, hoists as one unit);
  *  - only expressions containing a provably costly node (a
  *    higher-order function, regex split, array_distinct, sort_array,
  *    or a per-character string scan) — attribute refs, literals, and
  *    plain arithmetic are never worth a schema change;
  *  - join types whose condition is a FILTER over the cross space
  *    (Inner/Cross/LeftSemi/LeftAnti) — outer joins' null-extension
  *    rows never evaluate the condition anyway, but stay out of scope
  *    conservatively;
  *  - output schema preserved by an outer Project of the original
  *    join output; idempotent (after hoisting, the condition holds
  *    attribute refs, which are never expensive).
  *
  * Installed by [[GraftOptimizations.install]] AFTER the band rules:
  * within one optimizer pass the bands inject their conjuncts first,
  * then this rule hoists each side's heavy subtrees — including the
  * band's own `t·size(tok(x))` halves.
  */
object HoistJoinConditionSubexpressions extends Rule[LogicalPlan] {

  /** Provably costly to re-evaluate per pair. A deterministic ScalaUDF
    * counts: it is an opaque black box with serialization overhead per
    * call (non-deterministic ones never reach here — the caller gates
    * on `deterministic`).
    */
  private def expensive(e: Expression): Boolean = e.exists {
    case _: HigherOrderFunction => true
    case _: StringSplit => true
    case _: ArrayDistinct => true
    case _: SortArray => true
    case _: RegExpReplace => true
    case _: RegExpExtract => true
    case _: StringTranslate => true
    case _: ScalaUDF => true
    // this library's own Catalyst expressions (tokenizers, language
    // id, per-char scalars) are per-row scans too
    case e if e.getClass.getName.startsWith("graft.") => true
    case _ => false
  }

  /** Maximal deterministic single-side subexpressions of `cond`
    * (top-down: a recorded node's children are not descended).
    */
  private def collectSided(cond: Expression, side: AttributeSet): Seq[Expression] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Expression]
    def walk(e: Expression): Unit = {
      val sided = e.references.nonEmpty && e.references.subsetOf(side)
      if (sided && e.deterministic && !e.isInstanceOf[Attribute] && expensive(e)) {
        if (!out.exists(_.semanticEquals(e))) out += e
      } else e.children.foreach(walk)
    }
    walk(cond)
    out.toSeq
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, jt @ (Inner | Cross | LeftSemi | LeftAnti), Some(cond), hint) =>
      val leftEs = collectSided(cond, l.outputSet)
      val rightEs = collectSided(cond, r.outputSet)
      if (leftEs.isEmpty && rightEs.isEmpty) j
      else {
        val lAlias = leftEs.map(e => Alias(e, "_hoist_l")())
        val rAlias = rightEs.map(e => Alias(e, "_hoist_r")())
        val repl: Seq[(Expression, Attribute)] =
          leftEs.zip(lAlias.map(_.toAttribute)) ++
            rightEs.zip(rAlias.map(_.toAttribute))
        val newCond = cond.transformDown {
          case e if repl.exists(_._1.semanticEquals(e)) =>
            repl.find(_._1.semanticEquals(e)).get._2
        }
        val newL = if (lAlias.isEmpty) l else Project(l.output ++ lAlias, l)
        val newR = if (rAlias.isEmpty) r else Project(r.output ++ rAlias, r)
        Project(j.output, Join(newL, newR, jt, Some(newCond), hint))
      }
  }
}
