package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for wrapping custom Catalyst expressions into public
  * `Column`s. Spark 4 moved `Column` to a backend-agnostic
  * representation (ColumnNode) and made the classic converters
  * `private[sql]`, so a library shipping native codegen expressions
  * (graft.functions.DotProduct) needs this one-file shim inside the
  * `org.apache.spark.sql` package — the established pattern for
  * Catalyst-extension libraries.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
