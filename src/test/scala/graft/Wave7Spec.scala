package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-7 operators vs in-memory brute forces. */
class Wave7Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("join_geo_radius equals the unblocked all-pairs brute force") {
    val pts = T(spark, TestSpark.Sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .map { k =>
        (k, (k * 53 % 1000) / 100.0 - 5.0,
          (k * 211 % 1000) / 100.0 - 5.0)
      }
    def hav(la: Double, oa: Double, lb: Double, ob: Double): Double = {
      def r(x: Double) = math.toRadians(x)
      2.0 * 6371.0 * math.asin(math.sqrt(
        math.pow(math.sin(r(lb - la) / 2), 2) +
          math.cos(r(la)) * math.cos(r(lb)) *
            math.pow(math.sin(r(ob - oa) / 2), 2)))
    }
    var n = 0L; var tot = 0L; var mn = Long.MaxValue
    for {
      (ida, la, oa) <- pts
      (idb, lb, ob) <- pts if ida < idb
      m = math.round(hav(la, oa, lb, ob) * 1000)
      if m <= 25000L
    } { n += 1; tot += m; mn = math.min(mn, m) }
    assert(n > 0, "fixture scatter must yield pairs")
    val got = SparkEntry.queries("join_geo_radius")(spark, TestSpark.Sf)
      .collect()(0)
    assert(got.getAs[Long]("n_pairs") == n,
      "grid blocking must lose no pair (completeness on the ±5° band)")
    assert(got.getAs[Long]("total_m") == tot)
    assert(got.getAs[Long]("min_m") == mn)
  }

  test("events_burstiness: fano equals a direct recompute; purchase bursts") {
    val counts = T(spark, TestSpark.Sf, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")))
      .count().collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).toSeq).toMap
    val got = SparkEntry.queries("events_burstiness")(spark, TestSpark.Sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_hours"), r.getAs[Double]("fano"))).toMap
    counts.foreach { case (t, cs) =>
      val n = cs.size.toDouble
      val mean = cs.sum / n
      val variance = cs.map(c => (c - mean) * (c - mean)).sum / (n - 1)
      val (gn, gf) = got(t)
      assert(gn == cs.size)
      assert(math.abs(gf - variance / mean) < 1e-4,
        s"$t: $gf vs ${variance / mean}")
    }
  }
}
