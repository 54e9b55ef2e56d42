package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 42: interval repair, peak concurrency, EB shrinkage,
  * capture-recapture. */
class Wave42Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("dim_interval_repair: every segment audited; repaired validity " +
      "never exceeds the raw span and overlaps were actually found") {
    val rows = SparkEntry.queries("dim_interval_repair")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("n_versions"), r.getAs[Long]("n_overlaps_fixed"),
        r.getAs[Long]("n_gaps"), r.getAs[Long]("total_days_valid")))
    assert(rows.length == 5)
    rows.foreach { case (_, n, o, g, days) =>
      assert(n > 0 && o >= 0 && g >= 0 && days > 0)
      assert(o + g <= n)
      // validity is capped at 40 days per version by construction
      assert(days <= n * 40)
    }
    // the drifted fixture must actually contain both defect kinds
    assert(rows.map(_._3).sum > 0, "no overlaps found")
    assert(rows.map(_._4).sum > 0, "no gaps found")
  }

  test("events_peak_concurrency: peaks are positive and bounded by the " +
      "day's session count") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("events_peak_concurrency")(
      spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val sessPerDay = T(spark, TestSpark.Sf, "events")
      .filter(col("user_id").isNotNull)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val day = r.getAs[java.sql.Date]("day").toString
      val peak = r.getAs[Long]("peak_concurrent")
      assert(peak >= 0 && peak <= sessPerDay(day),
        s"$day peak $peak vs ${sessPerDay(day)} sessions")
    }
    assert(rows.exists(_.getAs[Long]("peak_concurrent") > 1))
  }

  test("stats_eb_shrinkage: shrunk rates sit between the raw rate and " +
      "the global rate") {
    val rows = SparkEntry.queries("stats_eb_shrinkage")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Double]("raw_rate"),
        r.getAs[Double]("shrunk_rate"), r.getAs[Long]("n"),
        r.getAs[Long]("k")))
    assert(rows.nonEmpty)
    val pG = rows.map(_._4).sum.toDouble / rows.map(_._3).sum
    rows.foreach { case (raw, shrunk, _, _) =>
      val lo = math.min(raw, pG) - 1e-6
      val hi = math.max(raw, pG) + 1e-6
      assert(shrunk >= lo && shrunk <= hi,
        s"shrunk $shrunk outside [$lo, $hi] (raw $raw, global $pG)")
    }
  }

  test("stats_capture_recapture: estimates are at least the overlap " +
      "union lower bound and Chapman <= Lincoln-Petersen") {
    val r = SparkEntry.queries("stats_capture_recapture")(
      spark, TestSpark.Sf).collect().head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val m = r.getAs[Long]("m")
    val lp = r.getAs[Double]("lp_est")
    val ch = r.getAs[Double]("chapman_est")
    assert(m > 0 && m <= math.min(n1, n2))
    assert(lp >= n1 + n2 - m - 1e-9, "estimate below observed union")
    assert(ch <= lp + 1e-9, "Chapman must not exceed LP")
    assert(r.getAs[Long]("actual") >= n1 + n2 - m)
  }
}
