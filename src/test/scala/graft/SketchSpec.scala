package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("agg_hll_sketch estimate lands within HLL error of exact") {
    val r = SparkEntry.queries("agg_hll_sketch")(spark, TestSpark.Sf)
      .collect().head
    val est = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(exact > 0)
    assert(math.abs(est - exact) / exact < 0.05,
      s"estimate $est vs exact $exact")
  }

  test("compaction rewrites 64 fragments into 4 files, data unchanged") {
    val frag = Tmp.dir("spec_frag")
    val compact = Tmp.dir("spec_compact")
    val src = T(spark, TestSpark.Sf, "events")
      .select("event_id", "event_type", "value")
    src.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(4)
      .write.mode("overwrite").parquet(compact)
    def parts(dir: String): Int =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts(frag) == 64, s"frag=${parts(frag)}")
    assert(parts(compact) == 4, s"compact=${parts(compact)}")
    val a = spark.read.parquet(frag).agg(
      count(lit(1)), sum("event_id")).collect().head
    val b = spark.read.parquet(compact).agg(
      count(lit(1)), sum("event_id")).collect().head
    assert(a == b)
  }
}
