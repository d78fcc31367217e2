package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's SQL function registration.
  *
  * `classic.ExpressionUtils` is `private[sql]`; re-exporting the two
  * conversions from inside the package is the established pattern for
  * Spark extensions that build SQL functions from Column combinators
  * (rather than hand-written Expression classes). No behavior is
  * added — these delegate 1:1.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** EAGER conversion via the classic converter: the lazy
    * `ExpressionUtils.expression` wrapper (ColumnNodeExpression) is
    * only unwrapped when a plan's own analysis walks it — an
    * expression returned from a FunctionRegistry builder is spliced
    * in mid-resolution and the wrapper would survive to codegen and
    * fail there. The converter emits real catalyst nodes
    * (UnresolvedFunction etc.) that the analyzer finishes resolving
    * in its next pass.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
