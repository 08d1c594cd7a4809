package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into `private[sql]` Dataset construction — the
  * standard pattern every Spark-extension library uses to turn a
  * hand-built [[LogicalPlan]] back into a user-facing DataFrame
  * (compare Delta/Iceberg/Sedona, which all keep such a shim under
  * `org.apache.spark.sql`). Kept to the one call graft needs.
  */
object GraftSqlInternals {

  /** Wrap a resolved logical plan as a DataFrame on `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan beneath a DataFrame (resolved
    * attributes, ready to be re-parented under a custom node).
    */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Idempotently add a planner strategy to this session (the
    * public per-session injection point; cluster deployments use
    * `spark.sql.extensions=graft.GraftExtensions` instead).
    */
  def addStrategy(spark: SparkSession, s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }
}
