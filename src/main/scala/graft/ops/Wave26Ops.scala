package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Round-7 wave 26: irregular-gap decay scoring, nearest-neighbor as-of
  * matching, and the full-outer stream-stream join.
  *
  *  - `ts_ewma_irregular` is exponential decay over IRREGULARLY spaced
  *    observations — the regular-cadence `ts_ewma` can't express it
  *    (its decay is per-row, not per-elapsed-time). Half-life = 1 hour:
  *    the carried score halves once per whole elapsed hour, which makes
  *    the recurrence `s = v + (s_prev >> gap_hours)` PURE INTEGER on
  *    the cent grid — bit-portable to the recursive-CTE oracle, no
  *    float pow. Scale shape: series are independent per user, the fold
  *    runs inside `mapGroups` after one shuffle on user_id; parallelism
  *    = number of users, per-task cost = that user's history. This is
  *    the time-decayed-activity score every engagement/fraud pipeline
  *    keeps per entity.
  *  - `join_asof_nearest` completes the as-of matrix (backward =
  *    `join_asof`, bounded = `join_asof_tolerance`): each purchase
  *    takes the click with the smallest ABSOLUTE time distance within
  *    ±24 h, ties broken by earlier click then id — pandas
  *    `merge_asof(direction='nearest')` semantics. One shuffle on
  *    user_id; candidates are the per-user click×purchase pairs inside
  *    the window, then a per-purchase `row_number` picks the argmin (no
  *    second shuffle: the window partitions by the same key family).
  *    Gap seconds are integer (epoch-floored on both sides).
  *  - `stream_stream_full_outer_live` closes the streaming join matrix
  *    (inner → left → FULL): unmatched rows from EITHER side emit with
  *    nulls once the watermark proves no match can arrive. Each side
  *    has its own eviction horizon (a click's window closes 2 h behind
  *    the final watermark anchor, a purchase's 1 h — its candidate
  *    clicks precede it), so the post-stream filter keeps rows where
  *    every present side is inside its horizon; the oracle applies the
  *    SAME join-then-filter, making streamed ≡ batch full join on the
  *    kept region. Anchor = least(max click ts, max purchase ts): the
  *    watermark is the min over both inputs.
  */
object Wave26Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "ts_ewma_irregular",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            col("ts").cast("timestamp").cast("long").as("sec"),
            greatest(round(col("value") * 100).cast("long"), lit(0L))
              .as("v"))
          .as[(Long, Long, Long, Long)]
          .groupByKey(_._1)
          .mapGroups { (uid, it) =>
            val evs = it.toSeq.sortBy(e => (e._3, e._2)) // (ts, event_id)
            var score = evs.head._4
            var prevSec = evs.head._3
            evs.tail.foreach { case (_, _, sec, v) =>
              val d = math.min((sec - prevSec) / 3600, 62L).toInt
              score = v + (score >> d)
              prevSec = sec
            }
            (uid, evs.length.toLong, score)
          }
          .toDF("user_id", "n_events", "decay_score_c")
          .orderBy("user_id")
      },
      Some(
        "WITH RECURSIVE e AS (SELECT user_id, event_id, " +
          "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec, " +
          "greatest(CAST(round(value * 100) AS BIGINT), 0) AS v, " +
          "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i " +
          "FROM events), " +
          "n AS (SELECT user_id, max(i) AS ni FROM e GROUP BY user_id), " +
          "rec(user_id, i, sec, s) AS (" +
          "SELECT user_id, i, sec, v FROM e WHERE i = 1 " +
          "UNION ALL " +
          "SELECT e.user_id, e.i, e.sec, " +
          "e.v + (r.s >> CAST(least((e.sec - r.sec) // 3600, 62) AS INTEGER)) " +
          "FROM rec r JOIN e ON e.user_id = r.user_id AND e.i = r.i + 1) " +
          "SELECT r.user_id, CAST(n.ni AS BIGINT) AS n_events, " +
          "CAST(r.s AS BIGINT) AS decay_score_c " +
          "FROM rec r JOIN n ON n.user_id = r.user_id AND r.i = n.ni " +
          "ORDER BY r.user_id")
    ),
    Q(
      "join_asof_nearest",
      (s, dir) => {
        val ev = T(s, dir, "events")
          .withColumn("sec", col("ts").cast("timestamp").cast("long"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
            col("sec").as("psec"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("event_id").as("cid"),
            col("sec").as("csec"))
        val cand = p.join(c,
            col("user_id") === col("cu") &&
              abs(col("psec") - col("csec")) <= lit(86400L))
          .withColumn("gap_s", abs(col("psec") - col("csec")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("pid").orderBy(col("gap_s"), col("csec"), col("cid"))
        val best = cand
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("pid").as("bpid"), col("cid").as("nearest_click_id"),
            col("gap_s"))
        p.join(best, col("pid") === col("bpid"), "left")
          .select(col("pid"), col("user_id"), col("nearest_click_id"),
            col("gap_s"))
          .orderBy("pid")
      },
      Some(
        "WITH p AS (SELECT user_id, event_id AS pid, " +
          "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS psec " +
          "FROM events WHERE event_type = 'purchase'), " +
          "c AS (SELECT user_id AS cu, event_id AS cid, " +
          "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS csec " +
          "FROM events WHERE event_type = 'click'), " +
          "cand AS (SELECT p.user_id, p.pid, c.cid, c.csec, " +
          "abs(p.psec - c.csec) AS gap_s FROM p JOIN c ON p.user_id = c.cu " +
          "WHERE abs(p.psec - c.csec) <= 86400), " +
          "best AS (SELECT pid, cid, gap_s, row_number() OVER (" +
          "PARTITION BY pid ORDER BY gap_s, csec, cid) AS rn FROM cand) " +
          "SELECT p.pid, p.user_id, b.cid AS nearest_click_id, b.gap_s " +
          "FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b " +
          "ON p.pid = b.pid ORDER BY p.pid")
    ),
    Q(
      "stream_stream_full_outer_live",
      (s, dir) => {
        val name = s"live_ssfo_${System.nanoTime()}"
        val ev = EventOps.liveEvents(s, dir)
          .withColumn("ts", col("ts").cast("timestamp"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("ts").as("cts"),
            col("event_id").as("cid"))
          .withWatermark("cts", "1 hour")
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts").as("pts"),
            col("event_id").as("pid"))
          .withWatermark("pts", "1 hour")
        graft.StreamRun.withStateParts(s) {
          val q = clicks.join(buys,
              col("cu") === col("pu") &&
                col("pts") >= col("cts") &&
                col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"),
              "fullOuter")
            .select(col("cu"), col("cts"), col("cid"),
              col("pu"), col("pts"), col("pid"))
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        val m = T(s, dir, "events")
          .agg(least(
            max(when(col("event_type") === "click",
              col("ts").cast("timestamp"))),
            max(when(col("event_type") === "purchase",
              col("ts").cast("timestamp"))))).first().getTimestamp(0)
        s.table(name)
          .filter(
            (col("cts").isNull ||
              col("cts") <= lit(m) - expr("INTERVAL 121 MINUTES")) &&
            (col("pts").isNull ||
              col("pts") <= lit(m) - expr("INTERVAL 61 MINUTES")))
          .groupBy(coalesce(col("cu"), col("pu")).as("user_id"))
          .agg(
            sum(when(col("cid").isNotNull && col("pid").isNotNull, 1L)
              .otherwise(0L)).as("n_matched"),
            sum(when(col("pid").isNull, 1L).otherwise(0L))
              .as("n_click_only"),
            sum(when(col("cid").isNull, 1L).otherwise(0L))
              .as("n_buy_only"))
          .orderBy("user_id")
      },
      Some(
        "WITH mx AS (SELECT least(" +
          "max(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END), " +
          "max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)" +
          ") AS m FROM events), " +
          "c AS (SELECT user_id AS cu, event_id AS cid, " +
          "CAST(ts AS TIMESTAMP) AS cts FROM events " +
          "WHERE event_type = 'click'), " +
          "p AS (SELECT user_id AS pu, event_id AS pid, " +
          "CAST(ts AS TIMESTAMP) AS pts FROM events " +
          "WHERE event_type = 'purchase'), " +
          "j AS (SELECT cu, cid, cts, pu, pid, pts FROM c FULL JOIN p " +
          "ON cu = pu AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR), " +
          "f AS (SELECT j.* FROM j, mx WHERE " +
          "(cts IS NULL OR cts <= m - INTERVAL 121 MINUTE) AND " +
          "(pts IS NULL OR pts <= m - INTERVAL 61 MINUTE)) " +
          "SELECT coalesce(cu, pu) AS user_id, " +
          "CAST(sum(CASE WHEN cid IS NOT NULL AND pid IS NOT NULL " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS n_matched, " +
          "CAST(sum(CASE WHEN pid IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_click_only, " +
          "CAST(sum(CASE WHEN cid IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_buy_only " +
          "FROM f GROUP BY coalesce(cu, pu) ORDER BY user_id")
    )
  )
}
