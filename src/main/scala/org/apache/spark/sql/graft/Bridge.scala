package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the private[sql] Column <-> Expression converters
  * (Spark 4 moved Column construction behind ColumnNode). Lives under
  * org.apache.spark.sql to satisfy the private[sql] scope — the standard
  * technique for third-party Catalyst extensions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
