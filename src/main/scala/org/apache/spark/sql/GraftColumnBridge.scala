package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made Column a backend-agnostic wrapper (no public .expr);
  * the classic Expression↔Column converters live behind private[sql].
  * This bridge, compiled into the sql package as Spark extension
  * libraries conventionally do, re-exposes just the two conversions
  * the engine's custom expressions need.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
