package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-25 semantics vs in-memory recomputes. */
class Wave25Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("text_dedup_url: groups match the closed-form canonical key") {
    val got = SparkEntry.queries("text_dedup_url")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "recrawl groups exist by construction")
    // closed-form: canonical = lowercase host (source-derived), no port,
    // no tracking params, id param kept
    val docs = T(spark, TestSpark.Sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.groupBy { case (id, src) =>
      s"https://www.${src.toLowerCase}.example.com/docs/${id % 40}?id=${id % 5}"
    }.collect { case (k, ms) if ms.length >= 2 =>
      (k, ms.length.toLong, ms.map(_._1).min)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want, s"got=${got.length} want=${want.length}")
  }

  test("mm_dedup_bytes: per-source digest census matches MessageDigest " +
      "over the same bytes") {
    val got = SparkEntry.queries("mm_dedup_bytes")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val mdOf = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = T(spark, TestSpark.Sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), mdOf(r.getString(1))))
      .groupBy(_._1).map { case (src, ms) =>
        val uniq = ms.map(_._2).distinct.length.toLong
        (src, ms.length.toLong, uniq, ms.length - uniq)
      }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    got.foreach { case (src, n, u, d) =>
      assert(n == u + d && u > 0, s"source $src: census conserves")
    }
  }

  test("stream_stream_outer_live: streamed left join equals the batch " +
      "left join inside the closed horizon, and null rows exist") {
    val got = SparkEntry.queries("stream_stream_outer_live")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // batch recompute with the same cutoff
    val ev = T(spark, TestSpark.Sf, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val m = ev.agg(least(
      max(when(col("event_type") === "click", col("ts"))),
      max(when(col("event_type") === "purchase", col("ts")))))
      .first().getTimestamp(0)
    val c = ev.filter(col("event_type") === "click" &&
        col("ts") <= lit(m) - expr("INTERVAL 121 MINUTES"))
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        col("event_id").as("cid"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"),
        col("event_id").as("pid"))
    val want = c.join(p,
        col("cu") === col("pu") && col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("cu"))
      .agg(count(lit(1)).as("n"), count(col("pid")).as("nm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(1) - r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    got.foreach { case (u, n, nm, nu) =>
      assert(n == nm + nu, s"user $u: counts conserve")
    }
    assert(got.exists(_._4 > 0),
      "some clicks go unmatched — the OUTER half must fire")
  }
}
