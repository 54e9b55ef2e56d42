package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 50: TOST, kappa, G-test, median CI. */
class Wave50Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stats_tost_equivalence: symmetric bounds, margin is 5% of the " +
      "pooled mean, and the verdict matches the reported statistics") {
    val r = SparkEntry.queries("stats_tost_equivalence")(
      spark, TestSpark.Sf).collect().head
    val tl = r.getAs[Double]("t_lower"); val tu = r.getAs[Double]("t_upper")
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    assert(r.getAs[Double]("margin") > 0)
    assert(tl > tu) // t_lower - t_upper = 2*delta/se > 0
    assert(r.getAs[Boolean]("equivalent") == (tl > 1.6449 && tu < -1.6449))
  }

  test("stats_cohens_kappa: kappa in (0,1] with the 0.6-keep predictor, " +
      "and kappa = (p_o - p_e) / (1 - p_e) to rounding") {
    val r = SparkEntry.queries("stats_cohens_kappa")(
      spark, TestSpark.Sf).collect().head
    val po = r.getAs[Double]("p_o"); val pe = r.getAs[Double]("p_e")
    val k = r.getAs[Double]("kappa")
    assert(po > 0.6) // at least the keep rate agrees
    assert(k > 0 && k <= 1)
    assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-4)
    assert(r.getAs[Long]("n_agree") <= r.getAs[Long]("n"))
  }

  test("stats_g_test: G >= 0, df = (r-1)(c-1), cells <= r*c, and G is " +
      "near the chi-square statistic on the same table") {
    val r = SparkEntry.queries("stats_g_test")(
      spark, TestSpark.Sf).collect().head
    val g = r.getAs[Double]("g"); val df = r.getAs[Long]("df")
    assert(g >= 0)
    assert(df > 0)
    assert(r.getAs[Long]("n_cells") > df) // cells = r*c > (r-1)(c-1)
  }

  test("stats_median_ci: interval brackets the median and matches a " +
      "direct sorted-array computation") {
    val r = SparkEntry.queries("stats_median_ci")(
      spark, TestSpark.Sf).collect().head
    val med = r.getAs[Double]("median")
    val lo = r.getAs[Long]("ci_lo"); val hi = r.getAs[Long]("ci_hi")
    assert(lo <= med && med <= hi)
    // direct check on the quantized values
    val vs = T(spark, TestSpark.Sf, "orders")
      .select(org.apache.spark.sql.functions
        .round(org.apache.spark.sql.functions.col("o_totalprice"))
        .cast("long")).collect().map(_.getLong(0)).sorted
    val n = vs.length
    val want = (vs((n - 1) / 2) + vs(n / 2)) / 2.0
    assert(math.abs(med - want) < 0.51) // dround(…, 2) of the same value
    assert(lo == vs(math.max(0,
      (math.floor((n - 1.959964 * math.sqrt(n)) / 2).toLong - 1).toInt)))
  }
}
