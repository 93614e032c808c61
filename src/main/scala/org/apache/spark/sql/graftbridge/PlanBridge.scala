package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame bridge for graft's custom plan nodes.
  *
  * `Dataset.ofRows` is `private[sql]` (same Spark-Connect refactor that
  * hid the Column constructor — see [[ColumnBridge]]); custom-operator
  * libraries reach it from an `org.apache.spark.sql` subpackage. One
  * forwarder; all real plan code stays in `graft.plans`.
  */
object PlanBridge {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
