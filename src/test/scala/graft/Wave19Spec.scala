package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-19 semantics vs in-memory recomputes. */
class Wave19Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("ts_time_weighted_avg: weights cover the day exactly once") {
    val got = SparkEntry.queries("ts_time_weighted_avg")(
      spark, TestSpark.Sf).collect()
      .map(r => ((r.getLong(0), r.getAs[java.sql.Date]("day")),
        (r.getLong(2), r.getDouble(3))))
    assert(got.nonEmpty)
    // recompute one (user, day) directly
    val ((user, day), (n, twavg)) = got.maxBy(_._2._1)
    val rows = T(spark, TestSpark.Sf, "events")
      .filter(col("user_id") === user &&
        to_date(col("ts")) === lit(day.toString))
      .select(unix_timestamp(col("ts")).as("sec"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(rows.length == n)
    val dayEnd = java.time.LocalDate.parse(day.toString).plusDays(1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val wts = rows.indices.map { i =>
      val next = if (i + 1 < rows.length) rows(i + 1)._1 else dayEnd
      next - rows(i)._1
    }
    val expect = wts.zip(rows.map(_._3))
      .map { case (w, c) => w * c }.sum.toDouble / wts.sum / 100.0
    assert(math.abs(twavg - math.round(expect * 1e4) / 1e4) < 1e-9)
    // the weights tile from the first event to midnight, no overlap
    assert(wts.sum == dayEnd - rows.head._1)
  }

  test("ts_interval_union_len: covered length equals a brute-force " +
      "second-set union for one user") {
    val got = SparkEntry.queries("ts_interval_union_len")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (u, k, cov) =>
      assert(k >= 1 && cov >= 1800 && cov >= k * 1800,
        s"user $u: $k islands cover $cov")
    }
    val probe = got.minBy(_._1)._1
    val starts = T(spark, TestSpark.Sf, "events")
      .filter(col("user_id") === probe)
      .select(unix_timestamp(col("ts"))).collect().map(_.getLong(0))
    // merge intervals brute force
    val sorted = starts.sorted
    var covered = 0L; var curS = sorted.head; var curE = sorted.head + 1800
    var islands = 1L
    sorted.tail.foreach { s =>
      if (s > curE) { covered += curE - curS; curS = s; islands += 1 }
      curE = math.max(curE, s + 1800)
    }
    covered += curE - curS
    val mine = got.find(_._1 == probe).get
    assert(mine._2 == islands && mine._3 == covered)
  }

  test("text_code_score: counts are exact and prose stays below the " +
      "code threshold") {
    val got = SparkEntry.queries("text_code_score")(spark, TestSpark.Sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(!r.getBoolean(5), "synthetic prose must not flag as code")
    }
    val probe = got.head
    val text = T(spark, TestSpark.Sf, "documents")
      .filter(col("doc_id") === probe.getLong(0))
      .select("text").head().getString(0)
    assert(probe.getLong(1) == text.length)
    assert(probe.getLong(2) == text.count("{};=<>()[]".contains(_)))
    assert(probe.getLong(3) == text.count(_.isDigit))
  }

  test("text_langid_eval: matrix rows conserve the corpus and shares " +
      "sum to 1 per true class") {
    val got = SparkEntry.queries("text_langid_eval")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val total = T(spark, TestSpark.Sf, "documents").count()
    assert(got.map(_._3).sum == total)
    got.groupBy(_._1).foreach { case (lang, cells) =>
      assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-4, lang)
    }
    // the matrix agrees cell-by-cell with text_lang_id's row scoring
    val scored = SparkEntry.queries("text_lang_id")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (lang, pred, n, _) =>
      assert(scored((lang, pred)) == n, s"($lang,$pred)")
    }
  }
}
