package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column<->Expression converters — the
  * supported seam for exposing custom Catalyst Expressions as user-facing
  * Columns in Spark 4 (the public `new Column(expr)` constructor of Spark 3
  * was removed with the column-node API split). */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
