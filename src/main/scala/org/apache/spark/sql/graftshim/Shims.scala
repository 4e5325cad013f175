package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{
  Dataset => ClassicDataset,
  SparkSession => ClassicSparkSession,
  ExpressionUtils
}
import org.apache.spark.sql.execution.QueryExecution

/** Thin bridge to `private[sql]` Spark internals (Spark 4.x `classic` impl).
  *
  * Lives under `org.apache.spark.sql` so the Scala access checks for
  * `private[sql]` members pass; keeps every internal touch point in ONE
  * file so version bumps have a single seam. Public Spark API is used
  * everywhere else.
  */
object Shims {

  /** Wrap an analyzed/constructed logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Catalyst expression -> user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** User-facing Column -> Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** QueryExecution of a DataFrame (analyzed plan access). */
  def queryExecution(df: DataFrame): QueryExecution =
    df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]].queryExecution
}
