package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so library
  * code can materialize a DataFrame from a custom LogicalPlan (the standard
  * extension-library pattern; everything else in graft stays on public
  * API). */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ↔ catalyst Expression bridges (Spark 4 removed the public
    * Column(expr) constructor; `classic.ExpressionUtils` is the supported
    * internal path). Lets library code wrap a custom Expression as a
    * user-facing Column without a function-registry round-trip. */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
