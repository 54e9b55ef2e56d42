package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Probe: _metadata resolvability through withColumn projections. */
class MetaProbeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("_metadata resolves after withColumn on a parquet scan") {
    val dir = Tmp.dir("metaprobe")
    spark.range(10).selectExpr("id AS k").write.mode("overwrite")
      .parquet(dir)
    val scan = spark.read.parquet(dir)
      .withColumn("k2", col("k") * 2)
    val rows = scan.withColumn("p", col("_metadata.file_path")).collect()
    assert(rows.forall(_.getString(2).nonEmpty))
  }
}
