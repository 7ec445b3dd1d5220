package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge for lifting a custom `LogicalPlan` into a `DataFrame`.
  * `classic.Dataset.ofRows` is `private[sql]`, so the one-line shim
  * lives under the `org.apache.spark.sql` package — the standard
  * pattern for Spark extension libraries that add plan nodes. */
object GraftShimImpl {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
