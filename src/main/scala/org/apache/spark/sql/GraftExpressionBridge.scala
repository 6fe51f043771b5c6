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

  /** Register a function on a LIVE session (SparkSessionExtensions
    * only bind at session build time; a library handed an existing
    * session — like graft's driver contract — registers here). */
  def registerFunction(spark: SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
