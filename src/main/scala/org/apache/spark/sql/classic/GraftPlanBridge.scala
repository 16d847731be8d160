package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to construct a DataFrame from a custom LogicalPlan —
  * `Dataset.ofRows` is private[sql] (the same access pattern third-party
  * Spark plan extensions use). Everything else in the custom-operator stack
  * (graft.plans.AsOfJoin) lives on public APIs. */
object GraftPlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
