package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` plan→DataFrame constructor,
  * so engine code can wrap a custom [[LogicalPlan]] node (graft.plans.*)
  * in a DataFrame. This is the standard extension-library pattern for
  * custom operators: everything else (strategy injection, distribution/
  * ordering requirements) goes through public `SparkSessionExtensions` /
  * `spark.experimental` APIs.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
