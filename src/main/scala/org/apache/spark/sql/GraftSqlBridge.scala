package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4
  * removed the public `Column(expr)` constructor with the Connect
  * refactor; `classic.ExpressionUtils` is the sanctioned internal path
  * for extension libraries that define native Catalyst expressions).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame (private[sql]
    * `Dataset.ofRows` — the standard entry point for extension
    * libraries that build their own plan nodes).
    */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
