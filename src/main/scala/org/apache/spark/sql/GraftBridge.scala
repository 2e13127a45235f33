package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column onto ColumnNode; the Expression<->Column bridge
  * (`classic.ExpressionUtils`) is private[sql]. This shim re-exports the two
  * conversions graft's custom-Expression Column wrappers need. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an ALREADY-BUILT session (the
    * `spark.sql.extensions` path needs the config set before the session
    * exists; this is the runtime equivalent, mirroring
    * `experimental.extraOptimizations` for optimizer rules). The session
    * `FunctionRegistry` is private[sql], hence bridged here. */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
