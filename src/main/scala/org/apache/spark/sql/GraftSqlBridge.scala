package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression factories, for
  * library-defined Catalyst expressions (graft.functions.*). Spark 4
  * removed the public `new Column(expr)` constructor; placing this
  * two-liner inside the sql package is the established pattern for
  * extension libraries that ship native expressions. Nothing else in
  * this repo lives outside the `graft` namespace. */
object GraftSqlBridge {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
