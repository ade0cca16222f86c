package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql]` DataFrame-from-LogicalPlan
  * constructor — the same visibility pattern as [[StreamingBridge]] /
  * graftshim.GraftColumn. `Dataset.ofRows` analyzes the plan eagerly
  * (assertAnalyzed), so analysis failures surface at build time exactly
  * like `spark.sql` does. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
