package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-14 semantics vs in-memory recomputes (the oracle checks value
  * equality against DuckDB; these pin the ALGORITHMIC claims).
  */
class Wave14Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("win_gaps_islands: islands are maximal consecutive runs") {
    val got = SparkEntry.queries("win_gaps_islands")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getAs[Long]("l_suppkey"),
        r.getAs[java.sql.Date]("start_d").toLocalDate,
        r.getAs[java.sql.Date]("end_d").toLocalDate,
        r.getAs[Long]("days")))
    assert(got.nonEmpty)
    // span check: an island of n days spans exactly n-1 day steps
    got.foreach { case (sk, s, e, n) =>
      assert(java.time.temporal.ChronoUnit.DAYS.between(s, e) == n - 1,
        s"supplier $sk island $s..$e days=$n")
    }
    // maximality + exactness for the busiest supplier: recompute its
    // islands from the raw distinct ship-day set
    val busiest = got.groupBy(_._1).maxBy(_._2.map(_._4).sum)._1
    val days = T(spark, TestSpark.Sf, "lineitem")
      .filter(col("l_suppkey") === busiest)
      .select(to_date(col("l_shipdate")).as("d")).distinct()
      .collect().map(_.getAs[java.sql.Date]("d").toLocalDate)
      .sortBy(_.toEpochDay)
    val runs = days.foldLeft(List.empty[(java.time.LocalDate,
        java.time.LocalDate, Long)]) {
      case ((s, e, n) :: tail, d) if d == e.plusDays(1) =>
        (s, d, n + 1) :: tail
      case (acc, d) => (d, d, 1L) :: acc
    }.reverse.filter(_._3 >= 3)
    assert(got.filter(_._1 == busiest).map(t => (t._2, t._3, t._4))
      .toList == runs)
  }

  test("graph_triangle_count equals the brute-force recompute") {
    val row = SparkEntry.queries("graph_triangle_count")(
      spark, TestSpark.Sf).collect()(0)
    // rebuild the oriented edge set in memory (subset-capped graph)
    val li = T(spark, TestSpark.Sf, "lineitem")
      .filter(col("l_orderkey") <= 20000)
      .select("l_orderkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ss = g.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.size)
        yield (ss(i), ss(j))
    }.toSet
    assert(row.getAs[Long]("edges") == edges.size)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val tri = edges.toSeq.map { case (u, v) =>
      adj.getOrElse(v, Set.empty).count(w => edges.contains((u, w)))
    }.sum
    assert(row.getAs[Long]("triangles") == tri)
    assert(tri > 0, "the co-supplier subset graph must contain triangles")
  }

  test("ts_locf_gapfill: dense calendar, fill equals last observation") {
    val out = SparkEntry.queries("ts_locf_gapfill")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toLocalDate,
        Option(r.getAs[Any]("filled")).map(_.asInstanceOf[Long])))
    // per type: days are gap-free from first to last
    out.groupBy(_._1).foreach { case (t, rows) =>
      val ds = rows.map(_._2).sortBy(_.toEpochDay)
      ds.sliding(2).foreach {
        case Array(a, b) => assert(b == a.plusDays(1), s"$t gap $a→$b")
        case _ => ()
      }
    }
    // real sparsity: some days must be filled (no observation), and
    // every filled day carries the most recent observed count
    val daily = T(spark, TestSpark.Sf, "events")
      .filter(col("user_id") % 97 === 0)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .count().collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Date]("day").toLocalDate) -> r.getLong(2)).toMap
    val filledOnly = out.filter(r => !daily.contains((r._1, r._2)))
    assert(filledOnly.nonEmpty, "cohort series must have real gaps")
    out.groupBy(_._1).foreach { case (t, rows) =>
      var lastSeen: Option[Long] = None
      rows.sortBy(_._2.toEpochDay).foreach { case (_, d, got) =>
        daily.get((t, d)).foreach(n => lastSeen = Some(n))
        assert(got == lastSeen, s"$t $d: $got vs $lastSeen")
      }
    }
  }

  test("win_rolling_regr matches the OLS recompute on a sampled month") {
    val out = SparkEntry.queries("win_rolling_regr")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate,
        r.getAs[Double]("revenue"),
        Option(r.getAs[Any]("slope")).map(_.asInstanceOf[Long])))
    assert(out.nonEmpty)
    // first day of each month has a 1-row frame: slope undefined
    out.filter(_._1.getDayOfMonth == 1).foreach { case (d, _, s) =>
      assert(s.isEmpty || d.getDayOfMonth != 1 ||
        out.count(o => o._1.getMonth == d.getMonth &&
          o._1.getYear == d.getYear && o._1.isBefore(d)) > 0, s"$d")
    }
    val byDay = out.map(r => r._1 -> math.round(r._2 * 100)).toMap
    // recompute the trailing-7 OLS slope for every day of one month
    val probe = out.map(_._1).filter(_.getDayOfMonth >= 7)
      .maxBy(_.toEpochDay).withDayOfMonth(1)
    val monthDays = out.map(_._1)
      .filter(d => d.getYear == probe.getYear &&
        d.getMonth == probe.getMonth).sorted
    monthDays.zipWithIndex.foreach { case (d, i) =>
      val frame = monthDays.slice(math.max(0, i - 6), i + 1)
      val xs = frame.map(dd => java.time.temporal.ChronoUnit.DAYS
        .between(java.time.LocalDate.of(1992, 1, 1), dd))
      val ys = frame.map(byDay)
      val n = frame.size.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val den = n * sxx - sx * sx
      val expect =
        if (den == 0) None
        else Some(math.round((n * sxy - sx * sy).toDouble / den))
      assert(out.find(_._1 == d).get._3 == expect, s"$d")
    }
  }
}
