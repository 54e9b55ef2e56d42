package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 42: dimension hygiene, load curves, shrinkage estimates.
  *
  *  - `dim_interval_repair` is the SCD2 quality sweep every warehouse
  *    eventually needs: given a version table whose validity intervals
  *    drifted (overlaps from late loads, gaps from missed loads),
  *    truncate each version at its successor's start and report the
  *    damage per segment. One lead() window partitioned by the entity
  *    key — embarrassingly parallel in the dimension key.
  *  - `events_peak_concurrency` is the classic sweep-line: per-day
  *    peak number of simultaneously-open user sessions. Deltas are
  *    pre-aggregated per boundary timestamp (the determinism trick:
  *    ties collapse BEFORE the cumsum, so no within-timestamp order
  *    dependence), and the cumulative sum partitions by day because
  *    sessions are day-scoped — no global window.
  *  - `stats_eb_shrinkage` is empirical-Bayes (James-Stein-style)
  *    shrinkage of per-brand return rates toward the global rate —
  *    how a ranking system scores small-sample entities without being
  *    fooled by noise. Method-of-moments τ² from the between-brand
  *    spread; every moment is an exact integer ratio.
  *  - `stats_capture_recapture` is the Lincoln-Petersen / Chapman
  *    population estimate from two overlapping observation channels
  *    (click-reachable vs view-reachable users) — the standard trick
  *    for estimating TRUE corpus/user-base size from partial traces,
  *    with the exact count alongside for calibration.
  */
object Wave42Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "dim_interval_repair",
      (s, dir) => {
        // synthesize a drifted version table: each order opens a
        // customer "version" valid o_orderkey%40 days — overlapping
        // when orders are close, gapped when far apart
        val vers = T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey").as("k"), col("c_mktsegment"),
            col("o_orderdate").cast("date").as("vfrom"),
            date_add(col("o_orderdate").cast("date"),
              (col("o_orderkey") % 40).cast("int") + 1).as("vto"))
        val w = Window.partitionBy("k").orderBy("vfrom", "vto")
        val fixed = vers
          .withColumn("nxt", lead("vfrom", 1).over(w))
          .withColumn("vto_fixed",
            when(col("nxt").isNotNull && col("nxt") < col("vto"),
              col("nxt")).otherwise(col("vto")))
          .withColumn("overlap_fixed",
            (col("nxt").isNotNull && col("nxt") < col("vto"))
              .cast("long"))
          .withColumn("gap_after",
            (col("nxt").isNotNull && col("nxt") > col("vto"))
              .cast("long"))
        fixed.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_versions"),
            sum("overlap_fixed").as("n_overlaps_fixed"),
            sum("gap_after").as("n_gaps"),
            sum(datediff(col("vto_fixed"), col("vfrom")).cast("long"))
              .as("total_days_valid"))
          .orderBy("c_mktsegment")
      },
      Some(
        "WITH vers AS (SELECT c_custkey AS k, c_mktsegment, " +
          "CAST(o_orderdate AS DATE) AS vfrom, " +
          "CAST(o_orderdate AS DATE) + " +
          "CAST(o_orderkey % 40 + 1 AS INTEGER) AS vto " +
          "FROM orders JOIN customer ON o_custkey = c_custkey), " +
          "x AS (SELECT c_mktsegment, vfrom, vto, " +
          "lead(vfrom) OVER (PARTITION BY k ORDER BY vfrom, vto) AS nxt " +
          "FROM vers), " +
          "f AS (SELECT c_mktsegment, vfrom, " +
          "CASE WHEN nxt IS NOT NULL AND nxt < vto THEN nxt ELSE vto " +
          "END AS vto_fixed, " +
          "CAST(CASE WHEN nxt IS NOT NULL AND nxt < vto THEN 1 ELSE 0 " +
          "END AS BIGINT) AS overlap_fixed, " +
          "CAST(CASE WHEN nxt IS NOT NULL AND nxt > vto THEN 1 ELSE 0 " +
          "END AS BIGINT) AS gap_after FROM x) " +
          "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_versions, " +
          "CAST(sum(overlap_fixed) AS BIGINT) AS n_overlaps_fixed, " +
          "CAST(sum(gap_after) AS BIGINT) AS n_gaps, " +
          "CAST(sum(date_diff('day', vfrom, vto_fixed)) AS BIGINT) " +
          "AS total_days_valid FROM f GROUP BY 1 ORDER BY 1")
    ),
    Q(
      "events_peak_concurrency",
      (s, dir) => {
        // day-scoped sessions: [min ts, max ts] per (user, day); the
        // sweep aggregates deltas PER BOUNDARY TIMESTAMP first so the
        // cumsum never depends on within-timestamp tie order
        val sess = T(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .groupBy(col("user_id"), col("ts").cast("date").as("day"))
          .agg(min("ts").as("t0"), max("ts").as("t1"))
        val deltas = sess.select(col("day"), col("t0").as("t"),
            lit(1L).as("d"))
          .unionAll(sess.select(col("day"), col("t1").as("t"),
            lit(-1L).as("d")))
          .groupBy("day", "t").agg(sum("d").as("net"))
        val w = Window.partitionBy("day").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas
          .withColumn("open", sum("net").over(w))
          .groupBy("day")
          .agg(max("open").as("peak_concurrent"),
            count(lit(1)).as("n_boundaries"))
          .orderBy("day")
      },
      Some(
        "WITH sess AS (SELECT user_id, " +
          "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
          "min(CAST(ts AS TIMESTAMP)) AS t0, " +
          "max(CAST(ts AS TIMESTAMP)) AS t1 FROM events " +
          "WHERE user_id IS NOT NULL GROUP BY 1, 2), " +
          "deltas AS (SELECT day, t, CAST(sum(d) AS BIGINT) AS net FROM (" +
          "SELECT day, t0 AS t, 1 AS d FROM sess " +
          "UNION ALL SELECT day, t1, -1 FROM sess) GROUP BY 1, 2), " +
          "sweep AS (SELECT day, CAST(sum(net) OVER (PARTITION BY day " +
          "ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
          "AS BIGINT) AS open FROM deltas) " +
          "SELECT day, CAST(max(open) AS BIGINT) AS peak_concurrent, " +
          "CAST(count(*) AS BIGINT) AS n_boundaries FROM sweep " +
          "GROUP BY 1 ORDER BY 1")
    ),
    Q(
      "stats_eb_shrinkage",
      (s, dir) => {
        val per = T(s, dir, "lineitem")
          .join(broadcast(T(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            sum((col("l_returnflag") === "R").cast("long")).as("k"))
          .withColumn("p_hat", col("k").cast("double") / col("n"))
        val glob = per.groupBy()
          .agg(sum("k").as("gk"), sum("n").as("gn"),
            count(lit(1)).as("nb"))
          .withColumn("p_g", col("gk").cast("double") / col("gn"))
        // method-of-moments τ²: between-brand variance of p_hat minus
        // the mean binomial sampling variance (floored at a small
        // positive value so B stays defined when between-variance is
        // all sampling noise)
        // dsum at scale 15: the moment sums are sums of DOUBLES, so the
        // per-row scale-to-int makes them aggregation-order-independent
        // (the Det policy; raw double sums flap at the last ulp)
        val moments = per.crossJoin(broadcast(glob))
          .groupBy()
          .agg(
            dsum((col("p_hat") - col("p_g")) *
              (col("p_hat") - col("p_g")), 15).as("ssq"),
            dsum(col("p_g") * (lit(1.0) - col("p_g")) / col("n"), 15)
              .as("svar"),
            first("p_g").as("p_g"), first("nb").as("nb"))
          .withColumn("tau2",
            greatest((col("ssq") - col("svar")) / col("nb"), lit(1e-8)))
        per.crossJoin(broadcast(moments.select("p_g", "tau2")))
          .withColumn("svar_i",
            col("p_g") * (lit(1.0) - col("p_g")) / col("n"))
          .withColumn("b", col("svar_i") / (col("svar_i") + col("tau2")))
          .select(col("p_brand"), col("n"), col("k"),
            dround(col("p_hat"), 6).as("raw_rate"),
            dround(col("b") * col("p_g") +
              (lit(1.0) - col("b")) * col("p_hat"), 6).as("shrunk_rate"))
          .orderBy("p_brand")
      },
      Some(
        "WITH per AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS k FROM lineitem " +
          "JOIN part ON l_partkey = p_partkey GROUP BY 1), " +
          "p2 AS (SELECT p_brand, n, k, CAST(k AS DOUBLE) / n AS p_hat " +
          "FROM per), " +
          "g AS (SELECT CAST(sum(k) AS DOUBLE) / sum(n) AS p_g, " +
          "CAST(count(*) AS BIGINT) AS nb FROM per), " +
          "m AS (SELECT " +
          dsumSql("(p_hat - p_g) * (p_hat - p_g)", 15) + " AS ssq, " +
          dsumSql("p_g * (1.0 - p_g) / n", 15) + " AS svar, " +
          "any_value(p_g) AS p_g, any_value(nb) AS nb FROM p2, g), " +
          "t AS (SELECT p_g, greatest((ssq - svar) / nb, 1e-8) AS tau2 " +
          "FROM m) " +
          "SELECT p_brand, n, k, " + droundSql("p_hat", 6) +
          " AS raw_rate, " +
          droundSql("(p_g * (1.0 - p_g) / n) / " +
            "((p_g * (1.0 - p_g) / n) + tau2) * p_g + " +
            "(1.0 - (p_g * (1.0 - p_g) / n) / " +
            "((p_g * (1.0 - p_g) / n) + tau2)) * p_hat", 6) +
          " AS shrunk_rate FROM p2, t ORDER BY p_brand")
    ),
    Q(
      "stats_capture_recapture",
      (s, dir) => {
        val ev = T(s, dir, "events").filter(col("user_id").isNotNull)
        val s1 = ev.filter(col("event_type") === "click")
          .select("user_id").distinct()
        val s2 = ev.filter(col("event_type") === "view")
          .select("user_id").distinct()
        val m = s1.join(s2, Seq("user_id"), "left_semi")
          .agg(count(lit(1)).as("m"))
        val stats = s1.agg(count(lit(1)).as("n1"))
          .crossJoin(s2.agg(count(lit(1)).as("n2")))
          .crossJoin(m)
          .crossJoin(ev.select("user_id").distinct()
            .agg(count(lit(1)).as("actual")))
        stats.select(col("n1"), col("n2"), col("m"),
          dround(col("n1").cast("double") * col("n2") / col("m"), 2)
            .as("lp_est"),
          dround((col("n1") + lit(1)).cast("double") * (col("n2") + 1) /
            (col("m") + 1) - lit(1.0), 2).as("chapman_est"),
          col("actual"))
      },
      Some(
        "WITH s1 AS (SELECT DISTINCT user_id FROM events " +
          "WHERE event_type = 'click' AND user_id IS NOT NULL), " +
          "s2 AS (SELECT DISTINCT user_id FROM events " +
          "WHERE event_type = 'view' AND user_id IS NOT NULL), " +
          "c AS (SELECT " +
          "CAST((SELECT count(*) FROM s1) AS BIGINT) AS n1, " +
          "CAST((SELECT count(*) FROM s2) AS BIGINT) AS n2, " +
          "CAST((SELECT count(*) FROM s1 WHERE user_id IN " +
          "(SELECT user_id FROM s2)) AS BIGINT) AS m, " +
          "CAST((SELECT count(DISTINCT user_id) FROM events " +
          "WHERE user_id IS NOT NULL) AS BIGINT) AS actual) " +
          "SELECT n1, n2, m, " +
          droundSql("CAST(n1 AS DOUBLE) * n2 / m", 2) + " AS lp_est, " +
          droundSql("CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0",
            2) + " AS chapman_est, actual FROM c")
    )
  )
}
