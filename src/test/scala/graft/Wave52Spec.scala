package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 52: JS divergence, reconciliation, backtest, skew audit. */
class Wave52Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("text_js_divergence: symmetric-pair count C(s,2), values in " +
      "[0, ln 2], and same-distribution sources sit near zero") {
    val rows = SparkEntry.queries("text_js_divergence")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"),
        r.getAs[Double]("js_divergence")))
    val ns = T(spark, TestSpark.Sf, "documents")
      .select("source").distinct().count()
    assert(rows.length == ns * (ns - 1) / 2)
    rows.foreach { case (s1, s2, js) =>
      assert(s1 < s2)
      assert(js >= 0 && js <= math.log(2) + 1e-9)
    }
    // the synthetic corpus draws all sources from one token
    // distribution, so every pairwise JS must be small
    assert(rows.map(_._3).max < 0.1)
  }

  test("data_reconcile_snapshots: the four buckets exactly account for " +
      "both snapshots and the perturbation rates are ~1%/1%/0.5%") {
    val r = SparkEntry.queries("data_reconcile_snapshots")(
      spark, TestSpark.Sf).collect().head
    val m = r.getAs[Long]("n_match"); val c = r.getAs[Long]("n_changed")
    val ol = r.getAs[Long]("n_only_left")
    val or_ = r.getAs[Long]("n_only_right")
    val n = T(spark, TestSpark.Sf, "orders").count()
    assert(m + c + ol == n) // left side fully accounted
    assert(c > 0 && ol > 0 && or_ > 0)
    assert(c < n / 50 && ol < n / 50 && or_ < n / 100)
  }

  test("ts_forecast_backtest: per-type rows, MAEs positive, and skill " +
      "is consistent with the two MAEs") {
    val rows = SparkEntry.queries("ts_forecast_backtest")(
      spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mn = r.getAs[Double]("mae_naive")
      val ms = r.getAs[Double]("mae_seasonal")
      val sk = r.getAs[Double]("skill")
      assert(mn > 0 && ms > 0)
      assert(math.abs(sk - (1.0 - ms / mn)) < 1e-2)
      assert(r.getAs[Long]("n_days") > 0)
    }
  }

  test("data_bucket_skew_audit: bucket accounting matches the table " +
      "and ratios are coherent") {
    val r = SparkEntry.queries("data_bucket_skew_audit")(
      spark, TestSpark.Sf).collect().head
    assert(r.getAs[Long]("n_rows") ==
      T(spark, TestSpark.Sf, "lineitem").count())
    assert(r.getAs[Long]("n_buckets") <= 256)
    assert(r.getAs[Long]("max_load") >= r.getAs[Long]("min_load"))
    assert(r.getAs[Double]("skew_ratio") >= 1.0)
    val t3 = r.getAs[Double]("top3_share")
    assert(t3 > 0 && t3 <= 1)
  }
}
