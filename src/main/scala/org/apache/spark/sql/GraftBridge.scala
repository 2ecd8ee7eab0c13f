package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 moved these conversions into
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`; this object re-exposes the two calls graft's custom
  * Catalyst expressions need (the standard pattern for libraries that
  * ship native expressions against the classic API). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a raw LogicalPlan (`Dataset.ofRows` is private[sql]);
    * needed to hand a custom logical operator to the planner. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The planner strategies a SparkSessionExtensions instance would
    * inject (`buildPlannerStrategies` is private[sql]); lets tests
    * verify config-driven injection without a fresh SparkContext —
    * `spark.sql.extensions` is a static conf, unappliable to a reused
    * context in-JVM. */
  def plannerStrategies(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  /** Same for injected optimizer rules (`buildOptimizerRules` is
    * private[sql]). */
  def optimizerRules(ext: SparkSessionExtensions, spark: SparkSession):
      Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}
