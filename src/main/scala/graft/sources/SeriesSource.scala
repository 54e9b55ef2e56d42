package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2: a deterministic Mackey-Glass time-series generator —
  * `spark.read.format("rcseries").option("keys", 8).option("n", 1000)`
  * yields `(key long, t long, value double)`, one independent chaotic
  * series per key (keys differ by initial condition), one input partition
  * per key.
  *
  * This is the engine's "unbounded source" stand-in for RC workloads: the
  * classic ESN benchmark series, generated distributed — no data movement,
  * arbitrary scale, bit-reproducible (pure double recurrence, fixed
  * parameters). It also exercises the full connector surface
  * (TableProvider → Table → ScanBuilder → Batch → PartitionReader).
  */
class SeriesSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "rcseries"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeriesSource.schema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeriesTable(
      properties.getOrDefault("keys", "4").toInt,
      properties.getOrDefault("n", "1000").toInt)
}

object SeriesSource {
  val schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Euler-discretized Mackey-Glass; key varies the initial history. */
  def generate(key: Long, n: Int): Array[Double] = {
    val tau = 17
    val beta = 0.2
    val gamma = 0.1
    val x0 = 1.2 + 0.01 * (key % 37)
    val buf = collection.mutable.Queue.fill(tau + 1)(x0)
    var x = x0
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val xTau = buf.dequeue()
      x = x + beta * xTau / (1.0 + math.pow(xTau, 10.0)) - gamma * x
      buf.enqueue(x)
      out(i) = x
      i += 1
    }
    out
  }
}

final class SeriesTable(keys: Int, n: Int) extends Table with SupportsRead {
  override def name(): String = s"rcseries(keys=$keys, n=$n)"
  override def schema(): StructType = SeriesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeriesScanBuilder(keys, n)
}

final class SeriesScanBuilder(keys: Int, n: Int) extends ScanBuilder
    with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = SeriesSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(keys)(k => SeriesPartition(k.toLong, n))
  override def createReaderFactory(): PartitionReaderFactory =
    new SeriesReaderFactory
}

final case class SeriesPartition(key: Long, n: Int) extends InputPartition

final class SeriesReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeriesPartition]
    new PartitionReader[InternalRow] {
      private val values = SeriesSource.generate(sp.key, sp.n)
      private var i = -1
      override def next(): Boolean = { i += 1; i < values.length }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](sp.key, i.toLong, values(i)))
      override def close(): Unit = ()
    }
  }
}
