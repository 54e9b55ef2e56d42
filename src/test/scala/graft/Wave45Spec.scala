package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 45: target encoding, periodogram, l-diversity, Theil. */
class Wave45Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("data_target_encoding: smoothed sits between LOO extremes' " +
      "neighborhood and the global rate; LOO closed forms consistent") {
    val rows = SparkEntry.queries("data_target_encoding")(
      spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val gk = rows.map(_.getAs[Long]("k")).sum
    val gn = rows.map(_.getAs[Long]("n")).sum
    val pG = gk.toDouble / gn
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val k = r.getAs[Long]("k")
      val raw = k.toDouble / n
      val sm = r.getAs[Double]("smoothed")
      val lo = math.min(raw, pG) - 1e-6
      val hi = math.max(raw, pG) + 1e-6
      assert(sm >= lo && sm <= hi, s"smoothed $sm outside [$lo,$hi]")
      assert(math.abs(r.getAs[Double]("loo_if_pos") -
        math.round((k - 1.0) / (n - 1.0) * 1e6) / 1e6) < 2e-6)
      assert(r.getAs[Double]("loo_if_neg") >=
        r.getAs[Double]("loo_if_pos"))
    }
  }

  test("ts_periodogram: ratios are non-negative and finite for all " +
      "five candidate periods") {
    val rows = SparkEntry.queries("ts_periodogram")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("period"), r.getAs[Double]("power"),
        r.getAs[Double]("power_ratio")))
    assert(rows.map(_._1).toSeq == Seq(3L, 5L, 7L, 14L, 30L))
    rows.foreach { case (_, p, ratio) =>
      assert(p >= 0)
      assert(ratio >= 0 && !ratio.isNaN && !ratio.isInfinite)
    }
  }

  test("data_l_diversity: the audit is internally consistent") {
    val r = SparkEntry.queries("data_l_diversity")(
      spark, TestSpark.Sf).collect().head
    val g = r.getAs[Long]("n_groups"); val b = r.getAs[Long]("n_below_3")
    assert(g > 0 && b >= 0 && b <= g)
    assert(r.getAs[Long]("min_l") >= 1)
    val pct = r.getAs[Double]("pct_groups_failing")
    assert(math.abs(pct - math.round(b.toDouble / g * 100 * 1e4) / 1e4)
      < 2e-4)
  }

  test("stats_theil_decomposition: components are non-negative and " +
      "add up") {
    val r = SparkEntry.queries("stats_theil_decomposition")(
      spark, TestSpark.Sf).collect().head
    val t = r.getAs[Double]("t_total"); val b = r.getAs[Double]("t_between")
    val w = r.getAs[Double]("t_within")
    assert(t >= 0, s"t_total $t")
    assert(b >= -1e-6 && b <= t + 1e-6)
    assert(math.abs(t - b - w) < 2e-6)
  }
}
