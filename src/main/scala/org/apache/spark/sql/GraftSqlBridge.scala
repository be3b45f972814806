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

  /** Register a native expression under `name` for `spark.sql` users
    * (temp function in the session's FunctionRegistry — the codegen'd
    * expression itself, not a UDF wrapper). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
