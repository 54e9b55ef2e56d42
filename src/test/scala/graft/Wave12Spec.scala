package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-12 diagnostics vs in-memory recomputes. */
class Wave12Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("ts_acf_lags equals the textbook Pearson-per-lag recompute") {
    val series = T(spark, TestSpark.Sf, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .count().collect()
      .map(r => (r.getString(0), r.getAs[Any]("d") match {
        case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
        case t: java.time.LocalDateTime => t.toLocalDate
      }, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.toEpochDay).map(_._3).toIndexedSeq).toMap
    def pearson(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = xs.size.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy))
    }
    val got = SparkEntry.queries("ts_acf_lags")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getAs[Long]("lag")) ->
        r.getAs[Double]("acf")).toMap
    series.foreach { case (t, cs) =>
      (1 to 7).foreach { l =>
        if (cs.size > l + 1) {
          val r = pearson(cs.dropRight(l), cs.drop(l))
          assert(math.abs(got((t, l.toLong)) -
            math.round(r * 1e6) / 1e6) < 1e-9, s"$t lag $l")
        }
      }
    }
    // lag-1 autocorrelation of smooth daily traffic should be positive
    assert(got.collect { case ((_, 1L), v) => v }.exists(_ > 0))
  }

  test("text_zipf_slope equals the sorted-rank OLS recompute") {
    val freq = T(spark, TestSpark.Sf, "documents")
      .filter(col("lang") === "en")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1))
    val terms = freq.zipWithIndex.map { case ((_, f), i) =>
      (math.round(math.log(i + 1.0) * 1e3),
        math.round(math.log(f.toDouble) * 1e3))
    }
    val n = terms.length.toLong
    val sx = terms.map(_._1).sum
    val sy = terms.map(_._2).sum
    val sxx = terms.map(t => t._1 * t._1).sum
    val sxy = terms.map(t => t._1 * t._2).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
    val got = SparkEntry.queries("text_zipf_slope")(spark, TestSpark.Sf)
      .collect()(0)
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("zipf_slope") -
      math.round(slope * 1e6) / 1e6) < 1e-9)
  }

  test("events_interpurchase conserves gaps: sum(n) = purchases - users") {
    val got = SparkEntry.queries("events_interpurchase")(
      spark, TestSpark.Sf).collect()
    val purchases = T(spark, TestSpark.Sf, "events")
      .filter(col("event_type") === "purchase")
    val nP = purchases.count()
    val nU = purchases.select("user_id").distinct().count()
    assert(got.map(_.getAs[Long]("n")).sum == nP - nU,
      "each user contributes exactly (purchases - 1) gaps")
    val hours = got.map(_.getAs[Long]("gap_hours"))
    assert(hours.forall(h => h >= 0 && h <= 48))
  }
}
