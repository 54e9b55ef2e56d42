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

  test("agg_countmin never undercounts; overcount bounded by eps*N") {
    val rows = SparkEntry.queries("agg_countmin")(spark, TestSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("exact_cnt")).sum
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("est_cnt")
      assert(est >= exact, s"CMS undercounted: $r")
      // eps = 1e-4 → overcount <= eps * N (w.h.p.; deterministic seed
      // makes this a fixed fact for this dataset, not a flaky bound)
      assert(est - exact <= math.max(1L, (1e-4 * n).toLong * 10),
        s"CMS overcount too large: $r (N=$n)")
    }
  }

  test("agg_bloom_prune has zero false negatives and sane funnel") {
    val r = SparkEntry.queries("agg_bloom_prune")(spark, TestSpark.Sf)
      .collect().head
    val total = r.getAs[Long]("total_orders")
    val passed = r.getAs[Long]("bloom_passed")
    val exact = r.getAs[Long]("exact_matched")
    assert(exact > 0 && total >= passed)
    assert(passed >= exact, "bloom dropped a true match (false negative)")
    // 400k bits / 50k items ≈ 8 bits/key → FP rate ~2%; allow 10% slack
    // over the exact-match mass plus FP on the non-matching remainder
    assert(passed - exact <= math.max(10L, (0.1 * (total - exact)).toLong),
      s"bloom FP rate too high: passed=$passed exact=$exact total=$total")
  }

  test("agg_approx_quantile tracks exact percentiles") {
    val rows = SparkEntry.queries("agg_approx_quantile")(spark, TestSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a50, a95) = (r.getAs[Double]("apx_p50"), r.getAs[Double]("apx_p95"))
      val (e50, e95) = (r.getAs[Double]("ext_p50"), r.getAs[Double]("ext_p95"))
      // accuracy 10000 ⇒ positional error <= N/10000 positions; at spec
      // scale groups are < 10k rows so the sketch is positionally exact,
      // but approx_percentile returns a data value (no interpolation)
      // while percentile interpolates — allow the one-gap difference.
      assert(math.abs(a50 - e50) / math.max(1.0, e50) < 0.02, r.toString)
      assert(math.abs(a95 - e95) / math.max(1.0, e95) < 0.02, r.toString)
    }
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
