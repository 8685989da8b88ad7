package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Companion to [[GraftColumnBridge]] for whole-plan work: Spark 4
  * keeps `Dataset.ofRows` and the analyzed-plan accessor behind
  * `private[sql]`, and an extension library that contributes its own
  * logical operator (graft.plans.AsofJoin) needs exactly these two to
  * wrap a custom node back into the public DataFrame API.
  */
object GraftPlanBridge {
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
