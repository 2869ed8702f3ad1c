package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` access shim — the standard extension-library technique
  * for materializing a DataFrame from a custom LogicalPlan (the public
  * API has no entry point for library-defined operators; everything else
  * about the operator goes through the supported
  * `SparkSessionExtensions.injectPlannerStrategy` path). */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
