package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 46: ANOVA, Mann-Kendall, Spearman, runs test. */
class Wave46Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stats_anova_f: sums of squares are non-negative and F is " +
      "consistent with them") {
    val r = SparkEntry.queries("stats_anova_f")(spark, TestSpark.Sf)
      .collect().head
    val ssb = r.getAs[Double]("ss_between")
    val ssw = r.getAs[Double]("ss_within")
    val k = r.getAs[Long]("n_groups"); val n = r.getAs[Long]("n_total")
    assert(k == 5 && n > 0)
    assert(ssb >= 0 && ssw > 0)
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 0.01,
      s"f ${r.getAs[Double]("f_stat")} vs recomputed $f")
  }

  test("ts_mann_kendall: |S| bounded by the pair count and z " +
      "consistent with the continuity correction") {
    val r = SparkEntry.queries("ts_mann_kendall")(spark, TestSpark.Sf)
      .collect().head
    val n = r.getAs[Long]("n"); val sStat = r.getAs[Long]("s")
    assert(math.abs(sStat) <= n * (n - 1) / 2)
    val varS = r.getAs[Double]("var_s")
    assert(math.abs(varS - n.toDouble * (n - 1) * (2.0 * n + 5) / 18.0)
      < 1.0)
    val z = r.getAs[Double]("z")
    if (sStat > 0) assert(z > 0)
    if (sStat < 0) assert(z < 0)
  }

  test("stats_spearman_rank: rho in [-1, 1] and strongly positive " +
      "(more orders => more revenue)") {
    val r = SparkEntry.queries("stats_spearman_rank")(
      spark, TestSpark.Sf).collect().head
    val rho = r.getAs[Double]("spearman_rho")
    assert(rho >= -1 - 1e-9 && rho <= 1 + 1e-9)
    assert(rho > 0.3, s"expected clear positive rank correlation, " +
      s"got $rho")
  }

  test("stats_runs_test: run count bounded by steps and expected runs " +
      "matches the closed form") {
    val r = SparkEntry.queries("stats_runs_test")(spark, TestSpark.Sf)
      .collect().head
    val up = r.getAs[Long]("n_up"); val down = r.getAs[Long]("n_down")
    val runs = r.getAs[Long]("runs")
    assert(runs >= 1 && runs <= up + down)
    val e = 2.0 * up * down / (up + down) + 1.0
    assert(math.abs(r.getAs[Double]("expected_runs") - e) < 1e-3)
  }
}
