package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-33 semantics vs in-memory recomputes. */
class Wave33Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("data_dp_counts: the noised release matches the mechanism replay, " +
      "stays non-negative, and is within the geometric tail bound") {
    val got = SparkEntry.queries("data_dp_counts")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val truth = T(spark, TestSpark.Sf, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val cdf = Seq(-5 -> 1.0 / 48, -4 -> 1.0 / 24, -3 -> 1.0 / 12,
      -2 -> 1.0 / 6, -1 -> 1.0 / 3, 0 -> 2.0 / 3, 1 -> 5.0 / 6,
      2 -> 11.0 / 12, 3 -> 23.0 / 24, 4 -> 47.0 / 48)
    got.foreach { case (lang, dp, eps) =>
      val seed = lang.charAt(0).toInt * 256 + lang.charAt(1).toInt
      val u = ((seed.toLong * 1103515245L + 12345L) % 2147483647L)
        .toDouble / 2147483647.0
      val k = cdf.find(u < _._2).map(_._1).getOrElse(5)
      assert(dp == math.max(truth(lang) + k, 0L), s"$lang mechanism")
      assert(math.abs(dp - truth(lang)) <= 5, s"$lang tail capped at 5")
      assert(math.abs(eps - math.log(2)) < 1e-5)
    }
    // the mechanism is not the identity on this fixture: some language
    // actually gets nonzero noise
    assert(got.exists { case (l, dp, _) => dp != truth(l) },
      "noise fired somewhere")
  }

  test("text_ccnet_buckets: per-language terciles are balanced and head " +
      "outranks tail on mean log-frequency") {
    val got = SparkEntry.queries("text_ccnet_buckets")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val byLang = got.groupBy(_._1)
    byLang.foreach { case (lang, bs) =>
      assert(bs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L), s"$lang buckets")
      val sizes = bs.sortBy(_._2).map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang ntile balance: $sizes")
      val head = bs.find(_._2 == 1).get._4
      val tail = bs.find(_._2 == 3).get._4
      assert(head > tail, s"$lang head $head > tail $tail")
    }
    assert(byLang.keySet.size >= 3)
  }

  test("events_top_paths: prefix census matches an ordered replay") {
    val got = SparkEntry.queries("events_top_paths")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val code = Map("view" -> "v", "click" -> "c", "purchase" -> "p",
      "signup" -> "s").withDefaultValue("e")
    val paths = T(spark, TestSpark.Sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), code(r.getString(3))))
      .groupBy(_._1).map { case (_, es) =>
        es.sortBy(e => (e._2.toEpochSecond(java.time.ZoneOffset.UTC),
          e._3)).map(_._4).mkString.take(3)
      }.toSeq
    val want = paths.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(10).zipWithIndex
      .map { case ((p, n), i) => (i + 1L, p, n) }
    assert(got.toSeq == want)
    assert(got.head._3 >= got.last._3, "ranked by frequency")
  }
}
