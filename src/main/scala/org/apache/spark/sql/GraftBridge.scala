package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression converters so
  * graft can wrap custom Catalyst expressions (e.g. DotProduct) as
  * Columns — the standard pattern for native expression libraries on
  * Spark 4's node-based Column API. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
