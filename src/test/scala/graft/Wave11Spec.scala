package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-11 operators vs in-memory brute forces. */
class Wave11Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("text_mattr equals the sliding-window brute force") {
    val docs = T(spark, TestSpark.Sf, "documents")
      .filter(col("lang") === "en")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
      .filter(_._2.length >= 50)
    val brute = docs.map { case (id, toks) =>
      val wins = toks.sliding(50).map(_.distinct.length.toLong).toSeq
      id -> (toks.length.toLong, wins.size.toLong,
        math.round(wins.sum / (wins.size * 50.0) * 1e6) / 1e6)
    }.toMap
    val got = SparkEntry.queries("text_mattr")(spark, TestSpark.Sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("n_windows"),
          r.getAs[Double]("mattr"))).toMap
    assert(got == brute)
    assert(brute.nonEmpty)
  }

  test("stats_gini_activity equals the textbook sorted-rank recompute") {
    val cs = T(spark, TestSpark.Sf, "events")
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = cs.length.toLong
    val s1 = cs.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    val sc = cs.sum
    val gini = 2.0 * s1 / (n.toDouble * sc) - (n + 1).toDouble / n
    val got = SparkEntry.queries("stats_gini_activity")(
      spark, TestSpark.Sf).collect()(0)
    assert(got.getAs[Long]("n_users") == n)
    assert(got.getAs[Long]("n_events") == sc)
    assert(math.abs(got.getAs[Double]("gini") - gini) < 1e-6)
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("text_mix_entropy equals the direct recompute and is bounded") {
    val counts = T(spark, TestSpark.Sf, "documents")
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val got = SparkEntry.queries("text_mix_entropy")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("k"), r.getAs[Double]("h_nats"),
          r.getAs[Double]("evenness"))).toMap
    counts.foreach { case (lang, cs) =>
      val tot = cs.sum.toDouble
      val h = cs.map { c =>
        math.round(-(c / tot) * math.log(c / tot) * 1e9)
      }.sum / 1e9
      val (k, hn, ev) = got(lang)
      assert(k == cs.size)
      assert(math.abs(hn - math.round(h * 1e6) / 1e6) < 1e-9)
      assert(ev >= 0.0 && ev <= 1.0 + 1e-9,
        s"evenness must be in [0,1], got $ev")
    }
  }

  test("events_dau_wau equals the per-day brute force") {
    val active = T(spark, TestSpark.Sf, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getAs[Any]("d") match {
        case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
        case t: java.time.LocalDateTime => t.toLocalDate
      }))
    val days = active.map(_._2).distinct
    val brute = days.map { d =>
      val dau = active.filter(_._2 == d).map(_._1).distinct.size.toLong
      val wau = active.filter(a =>
        !a._2.isAfter(d) && !a._2.isBefore(d.minusDays(6)))
        .map(_._1).distinct.size.toLong
      d -> (dau, wau)
    }.toMap
    val got = SparkEntry.queries("events_dau_wau")(spark, TestSpark.Sf)
      .collect().map { r =>
        val d = r.getAs[java.time.LocalDateTime]("day").toLocalDate
        d -> (r.getAs[Long]("dau"), r.getAs[Long]("wau"))
      }.toMap
    assert(got == brute)
    // stickiness bounded: DAU <= WAU always
    brute.values.foreach { case (dau, wau) => assert(dau <= wau) }
  }
}
