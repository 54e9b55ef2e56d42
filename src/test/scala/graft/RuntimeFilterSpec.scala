package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof that Spark's runtime bloom-filter injection (InjectRuntimeFilter)
  * fires on our join shapes: a selective dimension filter builds a bloom
  * filter that prunes the FACT side's shuffle input before the join — at
  * 100 TB this cuts the dominant exchange, not just the probe. The default
  * thresholds target real scans (application side ≥ 10 GB), so this spec
  * scales them to fixture size the same way SkewJoinSpec scales the AQE
  * skew thresholds; the mechanism, not the threshold, is what carries.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // force a shuffle join: bloom injection targets shuffle legs
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  private def joined = {
    val li = T(spark, TestSpark.Sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = T(spark, TestSpark.Sf, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000)
      .select(col("o_orderkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy().agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sq"))
  }

  test("InjectRuntimeFilter adds a bloom might_contain to the fact scan") {
    val p = joined.queryExecution.optimizedPlan.toString
    assert(p.contains("might_contain") || p.contains("bloom_filter_agg"),
      s"expected a runtime bloom filter in the optimized plan:\n$p")
  }

  test("the bloom-filtered join result equals the plain join") {
    val viaBloom = joined.collect().head
    val o = TestSpark.spark // default session: no runtime filter tuning
    val li = T(o, TestSpark.Sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val dim = T(o, TestSpark.Sf, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000)
      .select(col("o_orderkey"))
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy().agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sq")).collect().head
    assert(viaBloom.getLong(0) == plain.getLong(0))
    assert(viaBloom.getLong(1) == plain.getLong(1))
  }
}
