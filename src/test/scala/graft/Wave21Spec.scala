package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-21 semantics vs in-memory recomputes. */
class Wave21Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stats_lift_table: deciles cover the corpus, lifts center on 1") {
    val got = SparkEntry.queries("stats_lift_table")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1L to 10L))
    val total = T(spark, TestSpark.Sf, "documents").count()
    assert(got.map(_._2).sum == total)
    // weighted average lift is 1 by construction
    val wavg = got.map(t => t._4 * t._2).sum / total
    assert(math.abs(wavg - 1.0) < 0.05, s"got $wavg")
    got.foreach { case (d, n, dups, lift) =>
      assert(dups <= n && lift >= 0, s"decile $d")
    }
  }

  test("ts_missingness_report: expected = observed + missing; longest " +
      "gap matches the brute-force scan") {
    val got = SparkEntry.queries("ts_missingness_report")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (t, exp, obs, miss, gap) =>
      assert(exp == obs + miss, t)
      assert(gap <= miss, t)
      assert((miss == 0) == (gap == 0), t)
    }
    // brute force one series
    val (t, _, _, _, gapGot) = got.maxBy(_._4)
    val days = T(spark, TestSpark.Sf, "events")
      .filter(col("user_id") % 97 === 0 && col("event_type") === t)
      .select(to_date(col("ts")).as("d")).distinct().collect()
      .map(_.getAs[java.sql.Date]("d").toLocalDate.toEpochDay).sorted
    val longest = days.sliding(2).map {
      case Array(a, b) => b - a - 1
      case _ => 0L
    }.foldLeft(0L)(math.max)
    assert(gapGot == longest, t)
  }

  test("win_nearest_price: the neighbor really is the closest peer") {
    val got = SparkEntry.queries("win_nearest_price")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // brute-force check within one status group
    val status = got.head._2
    val group = got.filter(_._2 == status)
      .map(t => t._1 -> math.round(t._3 * 100)).toMap
    got.filter(_._2 == status).foreach { case (k, _, p, nk, gap) =>
      val cents = math.round(p * 100)
      val best = group.removed(k).values.map(c => math.abs(c - cents)).min
      assert(gap == best, s"order $k: claimed $gap, true nearest $best")
      assert(math.abs(group(nk) - cents) == gap, s"order $k neighbor")
    }
  }

  test("agg_skyline_2d: frontier rows are mutually non-dominated and " +
      "every other order is dominated by some frontier row") {
    val got = SparkEntry.queries("agg_skyline_2d")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        math.round(r.getDouble(2) * 100)))
    assert(got.nonEmpty)
    // frontier is strictly decreasing in price over increasing date
    got.sortBy(_._2).sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 > a._2 && b._3 < a._3, s"${a._1} vs ${b._1}")
      case _ => ()
    }
    // coverage: every order is (weakly) dominated by a frontier row
    val all = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0),
        r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay,
        r.getLong(2)))
    val frontierKeys = got.map(_._1).toSet
    all.filterNot(o => frontierKeys.contains(o._1)).foreach {
      case (k, d, c) =>
        assert(got.exists(f => f._2 <= d && (f._3 < c ||
          (f._3 == c && f._2 <= d))), s"order $k undominated")
    }
  }
}
