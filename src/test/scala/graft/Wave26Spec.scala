package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-26 semantics vs in-memory recomputes. */
class Wave26Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("ts_ewma_irregular: integer halving recurrence matches a " +
      "sequential replay, and decay actually bites") {
    val got = SparkEntry.queries("ts_ewma_irregular")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val raw = T(spark, TestSpark.Sf, "events")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("long"),
        round(col("value") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.max(r.getLong(3), 0L)))
    val want = raw.groupBy(_._1).map { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      var s = sorted.head._4
      var prev = sorted.head._3
      sorted.tail.foreach { case (_, _, sec, v) =>
        s = v + (s >> math.min((sec - prev) / 3600, 62L).toInt)
        prev = sec
      }
      (u, sorted.length.toLong, s)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    // the decayed score must be far below the undecayed per-user sum
    val sums = raw.groupBy(_._1).map { case (u, e) => u -> e.map(_._4).sum }
    got.foreach { case (u, _, s) =>
      assert(s <= sums(u), s"user $u: decay can only shrink the sum")
    }
    assert(got.exists { case (u, _, s) => s < sums(u) / 2 },
      "hour-scale gaps must halve scores somewhere in the fixture")
  }

  test("join_asof_nearest: nearest-distance semantics with " +
      "earlier-click tie-break") {
    val got = SparkEntry.queries("join_asof_nearest")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.nonEmpty)
    val ev = T(spark, TestSpark.Sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("timestamp").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicks = ev.filter(_._3 == "click")
    val buys = ev.filter(_._3 == "purchase")
    val want = buys.map { case (u, pid, _, ps) =>
      val cand = clicks.filter(c => c._1 == u && math.abs(ps - c._4) <= 86400)
        .map(c => (math.abs(ps - c._4), c._4, c._2))
      if (cand.isEmpty) (pid, u, None, None)
      else {
        val b = cand.min
        (pid, u, Some(b._3), Some(b._1))
      }
    }.sortBy(_._1).toSeq
    assert(got.toSeq == want)
    assert(got.exists(_._3.isDefined) && got.exists(_._3.isEmpty),
      "the 24h bound must match somewhere and miss somewhere")
  }

  test("stream_stream_full_outer_live: streamed full join equals the " +
      "batch full join on the horizon-filtered region; both null sides " +
      "fire") {
    val got = SparkEntry.queries("stream_stream_full_outer_live")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val ev = T(spark, TestSpark.Sf, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val m = ev.agg(least(
      max(when(col("event_type") === "click", col("ts"))),
      max(when(col("event_type") === "purchase", col("ts")))))
      .first().getTimestamp(0)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        col("event_id").as("cid"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"),
        col("event_id").as("pid"))
    val want = c.join(p,
        col("cu") === col("pu") && col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"), "full")
      .filter(
        (col("cts").isNull ||
          col("cts") <= lit(m) - expr("INTERVAL 121 MINUTES")) &&
        (col("pts").isNull ||
          col("pts") <= lit(m) - expr("INTERVAL 61 MINUTES")))
      .groupBy(coalesce(col("cu"), col("pu")).as("u"))
      .agg(
        sum(when(col("cid").isNotNull && col("pid").isNotNull, 1L)
          .otherwise(0L)),
        sum(when(col("pid").isNull, 1L).otherwise(0L)),
        sum(when(col("cid").isNull, 1L).otherwise(0L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_._3 > 0), "click-only null rows must fire")
    assert(got.exists(_._4 > 0), "buy-only null rows must fire")
  }
}
