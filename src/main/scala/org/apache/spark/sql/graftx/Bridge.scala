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

  /** Inverse direction: StructType → V2 Columns (comments and DEFAULT
    * metadata preserved), for `Table.columns()` overrides.
    */
  def structTypeToV2Columns(schema: org.apache.spark.sql.types.StructType)
      : Array[org.apache.spark.sql.connector.catalog.Column] =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .structTypeToV2Columns(schema)

  /** `private[sql] CatalogV2Util.v2ColumnsToStructType` — Spark's own
    * V2-Column → StructType conversion, which keeps comment and
    * column-DEFAULT metadata intact (a hand-rolled conversion would
    * silently drop the write-side defaults).
    */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .v2ColumnsToStructType(cols)

  /** A batch of parquet files as a STREAMING-flagged DataFrame — what a V1
    * streaming `Source.getBatch` must return (MicroBatchExecution asserts
    * `isStreaming`). Exactly FileStreamSource's own shape: resolve a
    * parquet relation over the explicit file list, wrap it in a
    * `LogicalRelation(isStreaming = true)`. The batch still plans through
    * the native vectorized parquet reader with pushdown and codegen.
    */
  def streamingParquet(spark: SparkSession, paths: Seq[String],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (paths.isEmpty)
      classic.Dataset.ofRows(cs,
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          org.apache.spark.sql.catalyst.types.DataTypeUtils
            .toAttributes(schema),
          Seq.empty, isStreaming = true))
    else {
      val rel = org.apache.spark.sql.execution.datasources.DataSource(
        cs, className = "parquet", paths = paths,
        userSpecifiedSchema = Some(schema))
        .resolveRelation(checkFilesExist = false)
      classic.Dataset.ofRows(cs,
        org.apache.spark.sql.execution.datasources.LogicalRelation(
          rel, isStreaming = true))
    }
  }
}
