package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway the engine needs: turning a custom
  * [[LogicalPlan]] node into a user-facing DataFrame. `Dataset.ofRows` is
  * the canonical constructor every Spark extension library shims exactly
  * this way (a file under `org.apache.spark.sql` — the access pattern, not
  * an internal API copy); everything else the engine does goes through the
  * public DataFrame/SessionExtensions surface.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
