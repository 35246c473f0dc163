package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so library
  * code can materialize a DataFrame from a custom LogicalPlan (the standard
  * extension-library pattern; everything else in graft stays on public
  * API). */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
