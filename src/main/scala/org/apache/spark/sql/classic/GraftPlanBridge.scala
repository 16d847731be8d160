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

  /** Parse with THIS session active: parser behavior reads the
    * thread-local SQLConf (escapedStringLiterals, ordinal handling, ...),
    * which otherwise falls back to whatever session was last active on
    * the thread — wrong inside Engine.sql retry paths. */
  def parsePlan(spark: org.apache.spark.sql.SparkSession,
      text: String): LogicalPlan =
    spark.asInstanceOf[SparkSession].withActive(
      spark.sessionState.sqlParser.parsePlan(text))

  /** Run the analyzer (no final checks) with this session active. */
  def analyze(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): LogicalPlan =
    spark.asInstanceOf[SparkSession].withActive(
      spark.sessionState.analyzer.execute(plan))
}
