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
