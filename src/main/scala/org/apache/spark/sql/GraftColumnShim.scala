package org.apache.spark.sql

/** Column <-> catalyst Expression bridge (lives in the spark.sql
  * package to reach the private[sql] classic.ExpressionUtils). Needed
  * by graft's SQL function-registry builders, which compose PUBLIC
  * functions-API Columns (udafs, max_by, ...) but must hand the
  * registry a catalyst Expression.
  */
object GraftColumnShim {
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  /** EAGER node-to-expression conversion: ExpressionUtils.expression
    * wraps foreign ColumnNodes lazily (ColumnNodeExpression), which
    * cannot be returned from a function-registry builder — the
    * analyzer expects a real (possibly unresolved) expression tree.
    */
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
