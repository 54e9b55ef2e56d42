package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-30 semantics vs in-memory recomputes. */
class Wave30Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stats_poisson_bootstrap: CI brackets the point estimate and a " +
      "pure-Scala replica replay matches") {
    val got = SparkEntry.queries("stats_poisson_bootstrap")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == 5)
    got.foreach { case (et, n, m, lo, hi) =>
      assert(n == 50L, s"$et replica count")
      assert(lo <= m && m <= hi, s"$et CI brackets the mean")
    }
    // groups with per-row value variance get a CI with real width;
    // constant-valued groups legitimately collapse to a point
    val gotP0 = got.find(_._1 == "purchase").get
    assert(gotP0._5 - gotP0._4 > 0, "purchase CI has width")
    // replay one group's replica means exactly
    val rows = T(spark, TestSpark.Sf, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.round(r.getDouble(2) * 100)))
      .filter(_._2 == "purchase")
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563)
    val rmis = (1 to 50).map { b =>
      var ws = 0L; var wc = 0L
      rows.foreach { case (id, _, cents) =>
        val u = ((id * (1103515245L + b * 2L) + b * 1013904223L + 6789L)
          % 2147483647L).toDouble / 2147483647.0
        val w = cdf.indexWhere(u < _) match {
          case -1 => 5L; case k => k.toLong
        }
        ws += w * cents; wc += w
      }
      math.round(ws * 1000000.0 / wc)
    }
    val wantMean =
      math.round(rmis.map(_.toDouble).sum / rmis.length / 1e8 * 1e4) / 1e4
    val gotP = got.find(_._1 == "purchase").get
    assert(math.abs(gotP._3 - wantMean) < 1e-9, "purchase boot_mean")
  }

  test("events_seq_regex: journey counts match an ordered string replay") {
    val got = SparkEntry.queries("events_seq_regex")(spark, TestSpark.Sf)
      .collect().head
    val code = Map("view" -> "v", "click" -> "c", "purchase" -> "p",
      "signup" -> "s").withDefaultValue("e")
    val js = T(spark, TestSpark.Sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), code(r.getString(3))))
      .groupBy(_._1).map { case (_, es) =>
        es.sortBy(e => (e._2.toEpochSecond(java.time.ZoneOffset.UTC),
          e._3)).map(_._4).mkString
      }.toSeq
    assert(got.getLong(0) == js.length.toLong)
    assert(got.getLong(1) ==
      js.count(_.matches(".*v.*c.*p.*")).toLong, "v.*c.*p")
    assert(got.getLong(2) == js.count(_.matches(".*s.*p.*")).toLong)
    assert(got.getLong(3) == js.count(_.matches(".*e.*e.*e.*")).toLong)
    assert(got.getLong(4) == js.map(_.length).max.toLong)
    assert(got.getLong(1) > 0, "the funnel pattern matches someone")
  }

  test("win_rolling_median: trailing-7 exact median matches a replay and " +
      "is robust where the mean is not") {
    val got = SparkEntry.queries("win_rolling_median")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getDouble(3)))
    val daily = got.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    daily.foreach { case (et, days) =>
      days.zipWithIndex.foreach { case ((_, _, _, med), i) =>
        val win = days.slice(math.max(0, i - 6), i + 1).map(_._3).sorted
        val n = win.length
        val pos = 0.5 * (n - 1)
        val lo = win(pos.toInt)
        val hi = win(math.ceil(pos).toInt)
        val want = lo + (pos - pos.toInt) * (hi - lo)
        assert(math.abs(med - math.round(want * 100) / 100.0) < 0.011,
          s"$et median at index $i")
      }
    }
  }

  test("ts_kalman_1d: filter matches a pure-Scala replay and the gain " +
      "converges to the steady state") {
    val got = SparkEntry.queries("ts_kalman_1d")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    val hourly = T(spark, TestSpark.Sf, "events")
      .groupBy(col("event_type"),
        (unix_timestamp(date_trunc("hour", col("ts")).cast("timestamp"))
          / 3600L).cast("long").as("hb"))
      .agg((sum(round(col("value") * 100).cast("long")).cast("double")
        / count(lit(1))).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = hourly.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      val series = rows.sortBy(_._2)
      var s = series.head._3; var p = 10000.0
      series.map { case (_, hb, y) =>
        val pp = p + 25.0
        val k = pp / (pp + 2500.0)
        s = s + k * (y - s)
        p = (1 - k) * pp
        (et, hb,
          BigDecimal(y / 100).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(s / 100).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(k).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    val gotKeyed = got.map(r =>
      (r._1, r._2.toEpochSecond(java.time.ZoneOffset.UTC) / 3600,
        r._3, r._4, r._5)).sortBy(r => (r._1, r._2))
    assert(gotKeyed.toSeq == want)
    // steady-state gain: K* solves K = (P+q)/(P+q+r) with P = (1-K)(P+q)
    // → K* = (−q + sqrt(q² + 4qr)) / (2r), q=25, r=2500
    val kStar = (-25.0 + math.sqrt(25.0 * 25 + 4 * 25 * 2500)) / (2 * 2500)
    val lastGains = got.groupBy(_._1).map(_._2.maxBy(_._2)._5)
    lastGains.foreach(k => assert(math.abs(k - kStar) < 1e-3,
      s"gain $k converged to $kStar"))
  }
}
