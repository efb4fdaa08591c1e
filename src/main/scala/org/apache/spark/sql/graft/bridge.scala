package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, ExpressionUtils, SparkSession}

/** Bridge into the `private[sql]` Expression <-> Column / LogicalPlan
  * <-> DataFrame converters — the supported extension-point surface for
  * libraries shipping native Catalyst expressions and custom logical
  * operators on Spark 4's split Column API. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame (classic session). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for plan composition). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.asInstanceOf[Dataset[_]].queryExecution.analyzed
}
