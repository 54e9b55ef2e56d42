package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof that AQE's OptimizeSkewedJoin fires on a genuinely skewed join and
  * that the split preserves the result. The sf0.1 fixtures are too uniform
  * to trip the rule (documented negative in SURVEY §9), so this spec builds
  * its own hot-key fixture: 200k rows where 90% share one join key, giving
  * one shuffle partition ~100× the median. With the skew thresholds scaled
  * down to test size (the same ratio a 256 MB default is to a real shuffle),
  * the executed plan must show the skewed partition split — the mechanism a
  * 1000-executor cluster relies on to not straggle on a hot key.
  */
class SkewJoinSpec extends AnyFunSuite {
  // isolated SQLConf: shares the SparkContext but keeps the skew-tuned
  // settings away from the other suites running on TestSpark.spark
  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    // force a sort-merge join: skew handling only applies to shuffle joins
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  // 90% of fact rows share key 0; dim side is uniform over all 1000 keys
  private def skewedJoin = {
    val fact = spark.range(0, 200000L, 1, 8).select(
      when(col("id") % 10 < 9, 0L).otherwise(col("id") % 1000L).as("k"),
      (col("id") * 3 % 7).as("v"))
    val dim = spark.range(0, 1000L, 1, 4).select(
      col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    fact.join(dim, "k")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
  }

  test("OptimizeSkewedJoin splits the hot partition (skew=true in plan)") {
    val df = skewedJoin
    df.collect() // AQE finalizes the plan only on execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"expected a skew-split SortMergeJoin in the final AQE plan:\n$p")
  }

  test("skew-split result equals the broadcast-join oracle") {
    val viaSkew = skewedJoin.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // oracle: same logical join with skew handling irrelevant (broadcast)
    val o = spark.newSession()
    o.conf.set("spark.sql.adaptive.enabled", "false")
    val fact = o.range(0, 200000L, 1, 8).select(
      when(col("id") % 10 < 9, 0L).otherwise(col("id") % 1000L).as("k"),
      (col("id") * 3 % 7).as("v"))
    val dim = o.range(0, 1000L, 1, 4).select(
      col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    val viaBhj = fact.join(broadcast(dim), "k")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSkew == viaBhj)
    // key 0 (the hot 90%) plus the 100 surviving id%1000 values ≡ 9 mod 10
    assert(viaSkew.size == 101)
  }
}
