package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface — the standard pattern Spark
  * extension libraries use to wrap a custom Catalyst [[Expression]] in a
  * public [[Column]] (Spark 4 moved Column onto ColumnNode; the classic
  * converter lives behind `private[sql]`). This is the ONLY file outside
  * the `graft` namespace; it contains no logic.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
