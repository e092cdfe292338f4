package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters in Spark 4
  * (`classic.ExpressionUtils`) — the standard extension-package pattern
  * for registering custom Catalyst expressions behind the public Column
  * API. Only used by graft.ext.Hashing. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
