package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` conversions between the public `Column` and
  * Catalyst `Expression` in Spark 4 (the `.expr` accessor of Spark 3.x
  * moved behind `org.apache.spark.sql.classic.ExpressionUtils`). Same
  * shim pattern used by third-party connectors/extension libraries.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
