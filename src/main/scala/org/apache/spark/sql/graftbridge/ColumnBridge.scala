package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow doorway to Spark's `private[sql]` Column ⇄ Expression bridge
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 removed the
  * public `new Column(expr)` constructor; this is the supported internal
  * path, isolated here so the engine has exactly one compile-time
  * dependency on Spark internals. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
