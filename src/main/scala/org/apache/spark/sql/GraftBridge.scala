package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column onto ColumnNode; the Expression<->Column bridge
  * (`classic.ExpressionUtils`) is private[sql]. This shim re-exports the two
  * conversions graft's custom-Expression Column wrappers need. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
