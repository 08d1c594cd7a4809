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

  /** Canonicalize -0.0/NaN bit patterns in an expression (no-op on
    * non-floating types). Spark's NormalizeFloatingNumbers rule does
    * this for Aggregate/Window/Join keys but never sees custom nodes,
    * so graft's TopKPerGroup applies it to its own group keys — under
    * bytewise UnsafeRow grouping, un-normalized -0.0 vs 0.0 would
    * form distinct groups and even hash to different partitions.
    */
  def normalizeFloatingNumbers(
      e: org.apache.spark.sql.catalyst.expressions.Expression):
      org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** The session's name-equality rule (honors spark.sql.caseSensitive). */
  def resolver(spark: SparkSession): org.apache.spark.sql.catalyst.analysis.Resolver =
    spark.asInstanceOf[classic.SparkSession].sessionState.analyzer.resolver
}
