package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Expression ↔ Column converters —
  * the minimal hook a library needs to expose custom Catalyst
  * expressions as Columns (Spark 4 removed the public
  * `new Column(expr)` constructor).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
