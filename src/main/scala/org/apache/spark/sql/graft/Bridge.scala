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

  /** An analyzed logical plan as a DataFrame (`Dataset.ofRows` is
    * private[sql]) — the seam DML commands use to hand a SQL MERGE's
    * source subquery to the library-level merge.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
