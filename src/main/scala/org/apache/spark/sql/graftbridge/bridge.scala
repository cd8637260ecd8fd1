package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression and LogicalPlan → DataFrame bridges. Spark 4
  * moved these conversions behind `private[sql]`
  * (columnNodeSupport.scala, classic.Dataset.ofRows); extensions that
  * define native Catalyst expressions or custom logical operators reach
  * them via a shim in the sql package — the standard technique used by
  * open-source Spark extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Wrap a (possibly custom) logical plan as a DataFrame — runs the
    * full analyzer/optimizer/planner on it like any API-built frame.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  /** The analyzed logical plan of a DataFrame. */
  def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
