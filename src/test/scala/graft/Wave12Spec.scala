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
}
