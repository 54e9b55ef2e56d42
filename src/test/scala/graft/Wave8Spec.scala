package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-8 statistics vs straightforward in-memory recomputes. */
class Wave8Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stats_ks_drift equals the single-threaded KS recompute") {
    val rows = T(spark, TestSpark.Sf, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select("value", "event_type").collect()
      .map(r => (r.getDouble(0), r.getString(1) == "purchase"))
    val n1 = rows.count(_._2).toLong
    val n2 = rows.count(!_._2).toLong
    var d = 0L; var ca = 0L; var cb = 0L
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      ca += g.count(_._2); cb += g.count(!_._2)
      d = math.max(d, math.abs(ca * n2 - cb * n1))
    }
    val got = SparkEntry.queries("stats_ks_drift")(spark, TestSpark.Sf)
      .collect()(0)
    assert(got.getAs[Long]("d_scaled") == d)
    assert(got.getAs[Long]("n1") == n1 && got.getAs[Long]("n2") == n2)
    assert(math.abs(got.getAs[Double]("ks") -
      d.toDouble / (n1.toDouble * n2)) < 1e-6)
    assert(d > 0, "distinct event types should differ somewhere")
  }

  test("stats_mannwhitney_u equals the textbook rank-sum recompute") {
    val rows = T(spark, TestSpark.Sf, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select("value", "event_type").collect()
      .map(r => (r.getDouble(0), r.getString(1) == "purchase"))
    val sorted = rows.sortBy(_._1)
    // average ranks with ties, doubled to stay integral
    var idx = 0
    var r2 = 0L
    while (idx < sorted.length) {
      var j = idx
      while (j < sorted.length && sorted(j)._1 == sorted(idx)._1) j += 1
      val doubledAvgRank = (idx + 1) + j // = 2 * (first + last)/2 ranks
      r2 += sorted.slice(idx, j).count(_._2).toLong * doubledAvgRank
      idx = j
    }
    val n1 = rows.count(_._2).toLong
    val n2 = rows.size - n1
    val u2 = r2 - n1 * (n1 + 1)
    val got = SparkEntry.queries("stats_mannwhitney_u")(
      spark, TestSpark.Sf).collect()(0)
    assert(got.getAs[Long]("u2_scaled") == u2,
      s"${got.getAs[Long]("u2_scaled")} vs $u2")
    assert(got.getAs[Long]("n1") == n1 && got.getAs[Long]("n2") == n2)
  }

  test("stats_ab_uplift: counts conserve clickers; z matches recompute") {
    val got = SparkEntry.queries("stats_ab_uplift")(spark, TestSpark.Sf)
      .collect()(0)
    val clickers = T(spark, TestSpark.Sf, "events")
      .filter(col("event_type") === "click")
      .select("user_id").distinct().count()
    assert(got.getAs[Long]("n_a") + got.getAs[Long]("n_b") == clickers)
    val (pa, pb) = (got.getAs[Double]("rate_a"), got.getAs[Double]("rate_b"))
    assert(math.abs(got.getAs[Double]("uplift") - (pa - pb)) < 2e-6)
    assert(!got.getAs[Double]("z_score").isNaN,
      "z must be defined (non-degenerate conversion rates)")
  }

  test("stats_chi2_independence equals the direct contingency recompute") {
    val obs = T(spark, TestSpark.Sf, "events")
      .groupBy(col("event_type"), hour(col("ts")))
      .count().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
    val rt = obs.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val ct = obs.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val n = obs.map(_._2).sum.toDouble
    // mirror the op's per-cell 1e6 quantization exactly
    val chi2 = obs.map { case ((t, h), o) =>
      val e = rt(t) * ct(h) / n
      math.round(math.pow(o - e, 2) / e * 1e6)
    }.sum / 1e6
    val got = SparkEntry.queries("stats_chi2_independence")(
      spark, TestSpark.Sf).collect()(0)
    assert(got.getAs[Long]("n_cells") == obs.length)
    assert(math.abs(got.getAs[Double]("chi2") - chi2) < 1e-6)
  }
}
