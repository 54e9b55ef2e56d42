package graft

import graft.rc.RcPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-file partitioned RC ingest: the end-to-end pipeline reading a
  * hive-partitioned CSV series directory must produce the SAME model and
  * scores as feeding the generator source directly — ingest adds file
  * layout, not semantics. CSV prints doubles at shortest round-trip
  * precision, so the equality is exact, not approximate.
  */
class RcIngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def direct = {
    import spark.implicits._
    spark.read.format("rcseries")
      .option("keys", 6).option("n", 400).load()
      .select(col("key"), col("t"), lit(0L), col("value"))
      .as[RcPipeline.Sample]
  }

  test("partitioned CSV landing zone has per-key dirs with multiple files") {
    val out = Tmp.dir("rc_ingest_spec")
    spark.read.format("rcseries")
      .option("keys", 6).option("n", 400).load()
      .repartition(4)
      .write.mode("overwrite").partitionBy("key")
      .option("header", "true").csv(out)
    val keyDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("key="))
    assert(keyDirs.length == 6, keyDirs.map(_.getName).toSeq)
    // round-robin repartition(4) spreads every key over all 4 writer tasks
    keyDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.startsWith("part-"))
      assert(parts.length > 1, s"${d.getName}: expected multi-file ingest")
    }
  }

  test("ingested pipeline is bit-identical to the direct path") {
    import spark.implicits._
    val out = Tmp.dir("rc_ingest_spec2")
    direct.toDF("key", "t", "zero", "value").select("key", "t", "value")
      .repartition(4)
      .write.mode("overwrite").partitionBy("key")
      .option("header", "true").csv(out)
    val ingested = spark.read
      .option("header", "true")
      .schema("t LONG, value DOUBLE, key LONG")
      .csv(out)
      .select(col("key"), col("t"), lit(0L), col("value"))
      .as[RcPipeline.Sample]

    val mIngest = RcPipeline.fit(ingested, lambda = 1e-6)
    val mDirect = RcPipeline.fit(direct, lambda = 1e-6)
    assert(mIngest.w.sameElements(mDirect.w),
      "readout weights differ between ingested and direct series")

    val sIngest = RcPipeline.score(ingested, mIngest).collect().sortBy(_._1)
    val sDirect = RcPipeline.score(direct, mDirect).collect().sortBy(_._1)
    assert(sIngest.sameElements(sDirect))
    assert(sIngest.length == 6)
    sIngest.foreach { case (k, _, mse) => assert(mse < 1e-3, s"key $k: $mse") }
  }

  test("the graded op runs and emits one row per key") {
    val rows = SparkEntry.queries("rc_ingest_partitioned")(
      spark, TestSpark.Sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(0)).toSeq == (0L to 5L))
  }
}
