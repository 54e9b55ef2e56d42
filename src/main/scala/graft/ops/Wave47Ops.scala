package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Round-8 wave 47: reliability + Bayesian rounding-out.
  *
  *  - `data_fk_orphans` is the referential-integrity audit a
  *    warehouse runs after every load: for each FK edge of the star
  *    schema (lineitem→orders, lineitem→part, lineitem→supplier,
  *    orders→customer), the child count, orphan count (left-anti to
  *    the parent key set) and orphan rate. Each edge is ONE anti-join
  *    that broadcasts the parent keys when small and shuffles
  *    otherwise — Catalyst picks per edge; no orphan materialization,
  *    counts only.
  *  - `events_burn_rate_alert` is the SRE multi-window error-budget
  *    burn-rate alert (the Google SRE workbook shape): error rates
  *    over a short (6 h) and long (24 h) trailing window per day-end,
  *    both expressed as multiples of a 1% budget; page when BOTH
  *    windows burn > 2× — the two-window AND is what suppresses
  *    blips and catches slow leaks. Trailing windows come from one
  *    day-level aggregate + range-frame sums, never a re-scan.
  *  - `stats_beta_posterior` is Beta-Binomial conversion estimation
  *    per segment: uniform prior, posterior mean (k+1)/(n+2) and the
  *    normal-approximation 95% credible interval — the Bayesian twin
  *    of stats_wilson_ci (same moments, different derivation — the
  *    Wilson op scores a frequentist CI, this one a posterior).
  */
object Wave47Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "data_fk_orphans",
      (s, dir) => {
        def edge(name: String, child: org.apache.spark.sql.DataFrame,
            childKey: String, parent: org.apache.spark.sql.DataFrame,
            parentKey: String) = {
          val orphans = child.join(parent
            .select(col(parentKey)).distinct(),
            col(childKey) === col(parentKey), "left_anti")
          child.agg(count(lit(1)).as("n_child"))
            .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
            .select(lit(name).as("fk_edge"), col("n_child"),
              col("n_orphans"),
              dround(col("n_orphans").cast("double") / col("n_child") *
                100, 6).as("orphan_pct"))
        }
        val li = T(s, dir, "lineitem")
        edge("lineitem->orders", li, "l_orderkey",
            T(s, dir, "orders"), "o_orderkey")
          .unionAll(edge("lineitem->part", li, "l_partkey",
            T(s, dir, "part"), "p_partkey"))
          .unionAll(edge("lineitem->supplier", li, "l_suppkey",
            T(s, dir, "supplier"), "s_suppkey"))
          .unionAll(edge("orders->customer", T(s, dir, "orders"),
            "o_custkey", T(s, dir, "customer"), "c_custkey"))
          .orderBy("fk_edge")
      },
      Some(
        "WITH e AS (" +
          "SELECT 'lineitem->orders' AS fk_edge, " +
          "CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child, " +
          "CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN " +
          "(SELECT o_orderkey FROM orders)) AS BIGINT) AS n_orphans " +
          "UNION ALL SELECT 'lineitem->part', " +
          "CAST((SELECT count(*) FROM lineitem) AS BIGINT), " +
          "CAST((SELECT count(*) FROM lineitem WHERE l_partkey NOT IN " +
          "(SELECT p_partkey FROM part)) AS BIGINT) " +
          "UNION ALL SELECT 'lineitem->supplier', " +
          "CAST((SELECT count(*) FROM lineitem) AS BIGINT), " +
          "CAST((SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN " +
          "(SELECT s_suppkey FROM supplier)) AS BIGINT) " +
          "UNION ALL SELECT 'orders->customer', " +
          "CAST((SELECT count(*) FROM orders) AS BIGINT), " +
          "CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN " +
          "(SELECT c_custkey FROM customer)) AS BIGINT)) " +
          "SELECT fk_edge, n_child, n_orphans, " +
          droundSql("CAST(n_orphans AS DOUBLE) / n_child * 100", 6) +
          " AS orphan_pct FROM e ORDER BY fk_edge")
    ),
    Q(
      "events_burn_rate_alert",
      (s, dir) => {
        // per-hour error/total counts, then trailing 6 h and 24 h
        // range-frame sums anchored at each hour boundary
        val hourly = T(s, dir, "events")
          // date_trunc yields LTZ even on an NTZ input — cast back so
          // the output column matches the oracle's plain TIMESTAMP
          .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz")
            .as("h"))
          .agg(count(lit(1)).as("n"),
            sum((col("event_type") === "error").cast("long")).as("e"))
          .withColumn("hl", (unix_timestamp(col("h")) / 3600L)
            .cast("long"))
        val w6 = org.apache.spark.sql.expressions.Window.orderBy("hl")
          .rangeBetween(-5, 0)
        val w24 = org.apache.spark.sql.expressions.Window.orderBy("hl")
          .rangeBetween(-23, 0)
        val budget = 0.01
        hourly
          .withColumn("e6", sum("e").over(w6))
          .withColumn("n6", sum("n").over(w6))
          .withColumn("e24", sum("e").over(w24))
          .withColumn("n24", sum("n").over(w24))
          .withColumn("burn6", dround(
            col("e6").cast("double") / col("n6") / budget, 4))
          .withColumn("burn24", dround(
            col("e24").cast("double") / col("n24") / budget, 4))
          .withColumn("page",
            col("burn6") > 2.0 && col("burn24") > 2.0)
          .filter(col("page"))
          .select(col("h"), col("burn6"), col("burn24"), col("page"))
          .orderBy("h")
          .limit(20)
      },
      Some(
        "WITH hourly AS (SELECT date_trunc('hour', " +
          "CAST(ts AS TIMESTAMP)) AS h, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS e FROM events GROUP BY 1), " +
          "hl AS (SELECT h, n, e, " +
          "CAST(epoch(h) // 3600 AS BIGINT) AS hl FROM hourly), " +
          "wnd AS (SELECT h, " +
          "CAST(sum(e) OVER (ORDER BY hl RANGE BETWEEN 5 PRECEDING " +
          "AND CURRENT ROW) AS BIGINT) AS e6, " +
          "CAST(sum(n) OVER (ORDER BY hl RANGE BETWEEN 5 PRECEDING " +
          "AND CURRENT ROW) AS BIGINT) AS n6, " +
          "CAST(sum(e) OVER (ORDER BY hl RANGE BETWEEN 23 PRECEDING " +
          "AND CURRENT ROW) AS BIGINT) AS e24, " +
          "CAST(sum(n) OVER (ORDER BY hl RANGE BETWEEN 23 PRECEDING " +
          "AND CURRENT ROW) AS BIGINT) AS n24 FROM hl), " +
          "b AS (SELECT h, " +
          droundSql("CAST(e6 AS DOUBLE) / n6 / 0.01", 4) + " AS burn6, " +
          droundSql("CAST(e24 AS DOUBLE) / n24 / 0.01", 4) +
          " AS burn24 FROM wnd) " +
          "SELECT h, burn6, burn24, true AS page FROM b " +
          "WHERE burn6 > 2.0 AND burn24 > 2.0 ORDER BY h LIMIT 20")
    ),
    Q(
      "stats_beta_posterior",
      (s, dir) => {
        val per = T(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .groupBy("user_id")
          .agg(max((col("event_type") === "purchase").cast("long"))
            .as("converted"))
          .withColumn("seg", col("user_id") % 5)
          .groupBy("seg")
          .agg(count(lit(1)).as("n"), sum("converted").as("k"))
        per
          .withColumn("post_mean",
            (col("k").cast("double") + 1.0) /
              (col("n").cast("double") + 2.0))
          .withColumn("post_var",
            col("post_mean") * (lit(1.0) - col("post_mean")) /
              (col("n").cast("double") + 3.0))
          .select(col("seg"), col("n"), col("k"),
            dround(col("post_mean"), 6).as("post_mean"),
            dround(col("post_mean") - lit(1.96) * sqrt(col("post_var")),
              6).as("ci_lo"),
            dround(col("post_mean") + lit(1.96) * sqrt(col("post_var")),
              6).as("ci_hi"))
          .orderBy("seg")
      },
      Some(
        "WITH pu AS (SELECT user_id, " +
          "CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 " +
          "END) AS BIGINT) AS converted FROM events " +
          "WHERE user_id IS NOT NULL GROUP BY 1), " +
          "per AS (SELECT user_id % 5 AS seg, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(converted) AS BIGINT) AS k FROM pu GROUP BY 1), " +
          "p AS (SELECT seg, n, k, " +
          "(CAST(k AS DOUBLE) + 1.0) / (CAST(n AS DOUBLE) + 2.0) " +
          "AS pm FROM per), " +
          "v AS (SELECT seg, n, k, pm, " +
          "pm * (1.0 - pm) / (CAST(n AS DOUBLE) + 3.0) AS pv FROM p) " +
          "SELECT seg, n, k, " + droundSql("pm", 6) + " AS post_mean, " +
          droundSql("pm - 1.96 * sqrt(pv)", 6) + " AS ci_lo, " +
          droundSql("pm + 1.96 * sqrt(pv)", 6) + " AS ci_hi " +
          "FROM v ORDER BY seg")
    )
  )
}
