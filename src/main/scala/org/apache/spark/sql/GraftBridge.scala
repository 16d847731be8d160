package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ↔ Column bridge for graft's typed Column API.
  *
  * Spark 4 hides the Expression-backed Column constructor behind
  * `private[sql]` (`classic.ExpressionUtils`); extension libraries
  * conventionally expose it via a shim in the org.apache.spark.sql package.
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
