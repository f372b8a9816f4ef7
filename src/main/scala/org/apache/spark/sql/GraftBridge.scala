package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column↔Expression bridge for custom Catalyst expressions. Spark 4 keeps
  * `classic.ExpressionUtils` private[sql]; this forwarder (same pattern as
  * public Spark-extension libraries use) re-exposes just the two
  * conversions graft needs.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
