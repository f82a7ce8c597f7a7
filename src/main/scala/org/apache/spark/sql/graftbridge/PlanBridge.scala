package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Doorway to `Dataset.ofRows` (private[sql]) — the way a library turns
  * a custom LogicalPlan node into a user-facing DataFrame. Isolated here
  * with ColumnBridge so Spark-internal surface stays in one package. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (child plans for custom
    * logical nodes must already be resolved). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
