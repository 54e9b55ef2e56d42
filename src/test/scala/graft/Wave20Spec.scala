package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-20 semantics vs in-memory recomputes. */
class Wave20Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("win_bollinger_bands: envelope matches the trailing-window " +
      "recompute; breakouts sit outside it") {
    val got = SparkEntry.queries("win_bollinger_bands")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate,
        r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))
    assert(got.nonEmpty)
    got.foreach { case (d, rev, mid, up, lo, breakout) =>
      assert(lo <= mid && mid <= up, s"$d")
      if (breakout) assert(rev > up - 0.01 || rev < lo + 0.01, s"$d")
    }
    // direct recompute over the daily aggregate for a sampled day
    val daily = T(spark, TestSpark.Sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("d"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toLocalDate -> r.getLong(1))
      .sortBy(_._1.toEpochDay)
    val idx = daily.length / 2
    val frame = daily.slice(idx - 20, idx).map(_._2)
    val n = frame.length.toLong
    val (s1, s2) = (frame.sum, frame.map(x => x * x).sum)
    val mean = s1.toDouble / n
    val sd = math.sqrt((n * s2 - s1 * s1).toDouble) / n
    val mine = got.find(_._1 == daily(idx)._1).get
    assert(math.abs(mine._3 - math.round(mean * 100) / 100.0) < 1e-9)
    assert(math.abs(mine._4 -
      math.round((mean + 2 * sd) * 100) / 100.0) < 1e-9)
  }

  test("events_error_budget: counts conserve; burning = rate > 0.25") {
    val got = SparkEntry.queries("events_error_budget")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.map(_._1).sum == T(spark, TestSpark.Sf, "events").count())
    assert(got.map(_._2).sum == T(spark, TestSpark.Sf, "events")
      .filter(col("event_type") === "error").count())
    got.foreach { case (tot, err, rate, burning) =>
      assert(err <= tot)
      assert(burning == (err.toDouble / tot > 0.25))
      assert(math.abs(rate - math.round(err.toDouble / tot * 1e6) / 1e6)
        < 1e-9)
    }
  }

  test("events_new_vs_returning: purchase counts conserve and the new " +
      "split matches first-active-day membership") {
    val got = SparkEntry.queries("events_new_vs_returning")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate,
        r.getLong(1), r.getLong(2)))
    val purchases = T(spark, TestSpark.Sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(got.map(t => t._2 + t._3).sum == purchases)
    // recompute membership
    val firstDay = T(spark, TestSpark.Sf, "events")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("fd"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[java.sql.Date]("fd").toLocalDate)
      .toMap
    val newCount = T(spark, TestSpark.Sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day")).collect()
      .count(r => firstDay(r.getLong(0)) ==
        r.getAs[java.sql.Date]("day").toLocalDate)
    assert(got.map(_._2).sum == newCount)
  }

  test("data_source_quota: caps at 50 per source, deterministic order") {
    val a = SparkEntry.queries("data_source_quota")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val b = SparkEntry.queries("data_source_quota")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq, "re-runs pick the identical sample")
    a.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.length <= 50, src)
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length), src)
    }
    val perSource = T(spark, TestSpark.Sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, n) =>
      assert(a.count(_._2 == src) == math.min(n, 50L), src)
    }
  }
}
