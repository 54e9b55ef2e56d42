package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal bridge into `org.apache.spark.sql`-private API surface: turning
  * a hand-built [[LogicalPlan]] into a [[DataFrame]]. Lives under the sql
  * package so `private[sql] Dataset.ofRows` is accessible — the same
  * pattern Spark extension libraries use (cf. SNIPPETS.md [3], Qbeast's
  * DatasetFactory).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
