package org.apache.spark.sql.graftx

import org.apache.hadoop.conf.Configuration

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{classic, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Bridge into the `private[sql]` parquet read/write machinery, for the
  * native DSv2 `Batch` scan and the row-level-operation write of the
  * snapshot table format. Lives under the sql package like [[Bridge]] —
  * the same pattern public Spark connectors (Iceberg, Delta) use to reach
  * `ParquetFileFormat` internals instead of reimplementing a parquet
  * reader.
  *
  * Both directions reuse Spark's own vectorized reader / parquet writer,
  * so the native scan keeps row-group pruning and the write keeps the
  * exact file layout `df.write.parquet` would produce.
  */
object ParquetBridge {

  /** A serializable per-file reader: ship it to executors and call it
    * with one [[PartitionedFile]] per data file. The returned iterator
    * yields `ColumnarBatch`es disguised as `InternalRow` when the
    * vectorized reader engages — callers unwrap via [[rows]].
    */
  def readerFunc(spark: SparkSession, dataSchema: StructType,
      required: StructType, filters: Seq[Filter])
      : PartitionedFile => Iterator[InternalRow] = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    // row-mode: the vectorized decoder still runs, but hands back rows —
    // a V2 PartitionReader[InternalRow] can't forward whole batches
    new ParquetFileFormat().buildReaderWithPartitionValues(
      cs, dataSchema, new StructType(), required, filters,
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      cs.sessionState.newHadoopConf())
  }

  /** Flatten a raw reader iterator into plain rows: the vectorized path
    * yields whole `ColumnarBatch` objects cast as `InternalRow` (the
    * long-standing `FileFormat` contract that `FileSourceScanExec`
    * special-cases); everything downstream of a V2 `PartitionReader`
    * needs real per-row `InternalRow`s.
    */
  def rows(raw: Iterator[InternalRow]): Iterator[InternalRow] =
    raw.asInstanceOf[Iterator[Object]].flatMap {
      case b: org.apache.spark.sql.vectorized.ColumnarBatch =>
        import scala.jdk.CollectionConverters._
        b.rowIterator().asScala
      case r: InternalRow => Iterator.single(r)
    }

  def partitionedFile(path: String, size: Long): PartitionedFile =
    partitionedFile(path, 0L, size, size)

  /** A byte-RANGE of one file: Spark's parquet reader processes exactly
    * the row groups whose midpoint falls inside [start, start+length),
    * so disjoint ranges covering the file partition its row groups
    * without coordination — the standard file-split contract.
    */
  def partitionedFile(path: String, start: Long, length: Long,
      fileSize: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path),
      start, length, Array.empty, 0L, fileSize,
      Map.empty)

  /** Spark's own parquet [[OutputWriterFactory]] for `schema` — the V2
    * `DataWriter` behind the row-level-operation write creates one
    * `OutputWriter` per task from it. Serializable by contract. Also
    * returns the PREPARED job configuration: `prepareWrite` registers
    * the write-support class and schema on it, and every task's
    * `TaskAttemptContext` must carry that config or the writer NPEs.
    */
  def writerFactory(spark: SparkSession, schema: StructType,
      conf: Configuration): (OutputWriterFactory, Configuration) = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val job = org.apache.hadoop.mapreduce.Job.getInstance(conf)
    val factory = new ParquetFileFormat().prepareWrite(cs, job,
      Map.empty[String, String], schema)
    (factory, job.getConfiguration)
  }
}
