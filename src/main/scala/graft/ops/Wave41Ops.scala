package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 41: sequential testing, risk curves, compliance, graphs.
  *
  *  - `stats_msprt` is the mixture sequential probability ratio test —
  *    the "always-valid p-value" an experimentation platform reports
  *    while an A/B test is still running (peeking-safe, unlike the
  *    fixed-horizon t-test). Normal mixture with τ² = pooled σ²; the
  *    two-sample statistic uses V = σ²(1/n0+1/n1). Cent-integer sums
  *    keep every input deterministic; doubles combine once at the end.
  *  - `ts_max_drawdown` walks the daily-revenue equity curve: running
  *    peak, per-day drawdown, worst five days. Both windows run over
  *    the calendar-bounded day aggregate (≤|days| rows), and the
  *    equity cumsum is an exact integer.
  *  - `data_right_to_erasure` is the GDPR deletion cascade: a seeded
  *    request set of customers, semi-join closure over orders →
  *    lineitem plus the events stream, and a per-table purge audit.
  *    The request set broadcasts; each fact table sees one anti/semi
  *    join — the shape a 100 TB compliance sweep needs (no shuffles
  *    beyond the audit counts).
  *  - `graph_link_prediction` scores NON-adjacent part pairs by
  *    Adamic-Adar over the co-purchase graph (parts sharing ≥2
  *    orders — the min-support gate is also the sparsifier that keeps
  *    the graph from degenerating into a clique): an oriented wedge
  *    join (u<w through common neighbor v), 1/ln(deg v) weights,
  *    minus-existing-edges anti-join. Same oriented-edge discipline
  *    as graph_triangle_count — wedges are enumerated once and the
  *    work is Σ deg(v)², not |V|².
  */
object Wave41Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "stats_msprt",
      (s, dir) => {
        val arms = T(s, dir, "events")
          .filter(col("event_type") === "purchase" &&
            col("user_id").isNotNull)
          .select((col("user_id") % 2).as("arm"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("arm")
          .agg(count(lit(1)).as("n"), sum("cents").as("sc"),
            sum(col("cents") * col("cents")).as("ssc"))
        val w = arms.groupBy()
          .agg(
            sum(when(col("arm") === 0, col("n"))).as("n0"),
            sum(when(col("arm") === 1, col("n"))).as("n1"),
            sum(when(col("arm") === 0, col("sc"))).as("sc0"),
            sum(when(col("arm") === 1, col("sc"))).as("sc1"),
            sum("ssc").as("ssc_all"), sum("sc").as("sc_all"),
            sum("n").as("n_all"))
          .withColumn("m0", col("sc0").cast("double") / col("n0") / 100.0)
          .withColumn("m1", col("sc1").cast("double") / col("n1") / 100.0)
          .withColumn("delta", col("m1") - col("m0"))
          // pooled variance of the per-event value, in dollars²
          .withColumn("var_p",
            (col("n_all").cast("double") * col("ssc_all") -
              col("sc_all").cast("double") * col("sc_all")) /
              (col("n_all").cast("double") * (col("n_all") - 1)) / 10000.0)
          .withColumn("v", col("var_p") *
            (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
          // mixture variance τ² = pooled σ² (the standard default)
          .withColumn("lam", sqrt(col("v") / (col("v") + col("var_p"))) *
            exp(col("delta") * col("delta") * col("var_p") /
              (lit(2.0) * col("v") * (col("v") + col("var_p")))))
        w.select(col("n0"), col("n1"),
            dround(col("delta"), 4).as("delta"),
            dround(col("lam"), 6).as("lambda"),
            dround(least(lit(1.0), lit(1.0) / col("lam")), 6).as("p_av"),
            (lit(1.0) / col("lam") < 0.05).as("reject"))
      },
      Some(
        "WITH arms AS (SELECT user_id % 2 AS arm, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc, " +
          "CAST(sum(CAST(round(value * 100) AS BIGINT) * " +
          "CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ssc " +
          "FROM events WHERE event_type = 'purchase' AND " +
          "user_id IS NOT NULL GROUP BY 1), " +
          "w AS (SELECT " +
          "CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0, " +
          "CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1, " +
          "CAST(sum(CASE WHEN arm = 0 THEN sc END) AS BIGINT) AS sc0, " +
          "CAST(sum(CASE WHEN arm = 1 THEN sc END) AS BIGINT) AS sc1, " +
          "CAST(sum(ssc) AS BIGINT) AS ssc_all, " +
          "CAST(sum(sc) AS BIGINT) AS sc_all, " +
          "CAST(sum(n) AS BIGINT) AS n_all FROM arms), " +
          "d AS (SELECT n0, n1, " +
          "CAST(sc1 AS DOUBLE) / n1 / 100.0 - " +
          "CAST(sc0 AS DOUBLE) / n0 / 100.0 AS delta, " +
          "(CAST(n_all AS DOUBLE) * ssc_all - " +
          "CAST(sc_all AS DOUBLE) * sc_all) / " +
          "(CAST(n_all AS DOUBLE) * (n_all - 1)) / 10000.0 AS var_p " +
          "FROM w), " +
          "e AS (SELECT n0, n1, delta, var_p, " +
          "var_p * (CAST(1.0 AS DOUBLE) / n0 + CAST(1.0 AS DOUBLE) / n1) " +
          "AS v FROM d), " +
          "f AS (SELECT n0, n1, delta, " +
          "sqrt(v / (v + var_p)) * exp(delta * delta * var_p / " +
          "(2.0 * v * (v + var_p))) AS lam FROM e) " +
          "SELECT n0, n1, " + droundSql("delta", 4) + " AS delta, " +
          droundSql("lam", 6) + " AS lambda, " +
          droundSql("least(CAST(1.0 AS DOUBLE), " +
            "CAST(1.0 AS DOUBLE) / lam)", 6) + " AS p_av, " +
          "CAST(1.0 AS DOUBLE) / lam < 0.05 AS reject FROM f")
    ),
    Q(
      "ts_max_drawdown",
      (s, dir) => {
        val daily = T(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(sum(round(col("o_totalprice")).cast("long")).as("rev"))
        val wCum = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("equity", sum("rev").over(wCum))
          .withColumn("peak", max("equity").over(wCum))
          .withColumn("dd", dround(
            (col("peak") - col("equity")).cast("double") / col("peak"), 6))
          .select("day", "equity", "peak", "dd")
          .orderBy(col("dd").desc, col("day"))
          .limit(5)
      },
      Some(
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) " +
          "AS rev FROM orders GROUP BY 1), " +
          "eq AS (SELECT day, CAST(sum(rev) OVER (ORDER BY day " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
          "AS equity FROM daily), " +
          "pk AS (SELECT day, equity, CAST(max(equity) OVER (ORDER BY day " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
          "AS peak FROM eq) " +
          "SELECT day, equity, peak, " +
          droundSql("CAST(peak - equity AS DOUBLE) / peak", 6) +
          " AS dd FROM pk ORDER BY dd DESC, day LIMIT 5")
    ),
    Q(
      "data_right_to_erasure",
      (s, dir) => {
        // seeded deletion-request set; the closure is key-driven so the
        // request set broadcasts and every fact table is one semi-join
        val reqs = T(s, dir, "customer")
          .filter(col("c_custkey") % 97 === 0)
          .select(col("c_custkey").as("k"))
        val ords = T(s, dir, "orders")
        val hitO = ords.join(broadcast(reqs),
          col("o_custkey") === col("k"), "left_semi")
        val li = T(s, dir, "lineitem")
        val hitL = li.join(broadcast(hitO.select(col("o_orderkey")
          .as("ok2"))), col("l_orderkey") === col("ok2"), "left_semi")
        val ev = T(s, dir, "events").filter(col("user_id").isNotNull)
        val hitE = ev.join(broadcast(reqs),
          col("user_id") === col("k"), "left_semi")
        def audit(name: String, total: org.apache.spark.sql.DataFrame,
            hit: org.apache.spark.sql.DataFrame) =
          hit.agg(count(lit(1)).as("purged"))
            .crossJoin(total.agg(count(lit(1)).as("n")))
            .select(lit(name).as("table_name"), col("purged"),
              (col("n") - col("purged")).as("kept"))
        audit("customer", T(s, dir, "customer"),
            T(s, dir, "customer").join(broadcast(reqs),
              col("c_custkey") === col("k"), "left_semi"))
          .unionAll(audit("orders", ords, hitO))
          .unionAll(audit("lineitem", li, hitL))
          .unionAll(audit("events", ev, hitE))
          .orderBy("table_name")
      },
      Some(
        "WITH reqs AS (SELECT c_custkey AS k FROM customer " +
          "WHERE c_custkey % 97 = 0), " +
          "ho AS (SELECT * FROM orders WHERE o_custkey IN " +
          "(SELECT k FROM reqs)), " +
          "a AS (SELECT 'customer' AS table_name, " +
          "CAST((SELECT count(*) FROM customer WHERE c_custkey IN " +
          "(SELECT k FROM reqs)) AS BIGINT) AS purged, " +
          "CAST((SELECT count(*) FROM customer) AS BIGINT) AS n " +
          "UNION ALL SELECT 'orders', " +
          "CAST((SELECT count(*) FROM ho) AS BIGINT), " +
          "CAST((SELECT count(*) FROM orders) AS BIGINT) " +
          "UNION ALL SELECT 'lineitem', " +
          "CAST((SELECT count(*) FROM lineitem WHERE l_orderkey IN " +
          "(SELECT o_orderkey FROM ho)) AS BIGINT), " +
          "CAST((SELECT count(*) FROM lineitem) AS BIGINT) " +
          "UNION ALL SELECT 'events', " +
          "CAST((SELECT count(*) FROM events WHERE user_id IN " +
          "(SELECT k FROM reqs)) AS BIGINT), " +
          "CAST((SELECT count(*) FROM events WHERE user_id IS NOT NULL) " +
          "AS BIGINT)) " +
          "SELECT table_name, purged, " +
          "CAST(n - purged AS BIGINT) AS kept FROM a ORDER BY table_name")
    ),
    Q(
      "graph_link_prediction",
      (s, dir) => {
        // co-purchase graph: parts sharing >=2 orders are adjacent —
        // probed from the shared build-once materialization
        // (GraphBase.edges), not rebuilt per query
        val edges = GraphBase.edges(s, dir)
          .select(col("u"), col("v").as("w"))
        // undirected adjacency + degree for the Adamic-Adar weight
        val adj = edges.select(col("u").as("x"), col("w").as("y"))
          .unionAll(edges.select(col("w").as("x"), col("u").as("y")))
        val deg = adj.groupBy("x").agg(count(lit(1)).as("deg"))
        // wedges u - v - w with u < w; weight 1/ln(deg v)
        val wedges = adj.as("l").join(adj.as("r"),
            col("l.x") === col("r.x") && col("l.y") < col("r.y"))
          .join(deg.select(col("x").as("vx"), col("deg")),
            col("vx") === col("l.x"))
          .select(col("l.y").as("u"), col("r.y").as("w"),
            (lit(1.0) / log(col("deg").cast("double"))).as("aa"))
        val scored = wedges.groupBy("u", "w")
          .agg(dround(sum("aa"), 6).as("score"),
            count(lit(1)).as("common"))
        // link PREDICTION: only pairs not already connected
        scored.join(edges, Seq("u", "w"), "left_anti")
          .orderBy(col("score").desc, col("u"), col("w"))
          .limit(10)
      },
      Some(
        "WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS v " +
          "FROM lineitem), " +
          "edges AS (SELECT a.v AS u, b.v AS w FROM li a " +
          "JOIN li b ON a.ok = b.ok AND a.v < b.v " +
          "GROUP BY 1, 2 HAVING count(*) >= 2), " +
          "adj AS (SELECT u AS x, w AS y FROM edges " +
          "UNION ALL SELECT w, u FROM edges), " +
          "deg AS (SELECT x, CAST(count(*) AS BIGINT) AS deg FROM adj " +
          "GROUP BY 1), " +
          "wedges AS (SELECT l.y AS u, r.y AS w, " +
          "CAST(1.0 AS DOUBLE) / ln(CAST(deg AS DOUBLE)) AS aa " +
          "FROM adj l JOIN adj r ON l.x = r.x AND l.y < r.y " +
          "JOIN deg ON deg.x = l.x), " +
          "scored AS (SELECT u, w, " + droundSql("sum(aa)", 6) +
          " AS score, CAST(count(*) AS BIGINT) AS common FROM wedges " +
          "GROUP BY u, w) " +
          "SELECT u, w, score, common FROM scored " +
          "WHERE NOT EXISTS (SELECT 1 FROM edges e " +
          "WHERE e.u = scored.u AND e.w = scored.w) " +
          "ORDER BY score DESC, u, w LIMIT 10")
    )
  )
}
