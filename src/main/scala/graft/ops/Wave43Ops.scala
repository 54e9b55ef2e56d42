package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 43: ranking evaluation + the experimentation suite.
  *
  *  - `vec_ndcg_at_k` evaluates a cosine ranker with NDCG@10 against
  *    the embeddings' class labels (relevant = same label as the
  *    query vector): top-10 by similarity is a bounded TakeOrdered,
  *    the ideal-DCG denominator needs only the corpus relevant-count,
  *    and the log2 discounts are identical IEEE ops on small ints.
  *  - `stats_mutual_information` measures column dependence
  *    (brand × return flag) in nats, plus the √(H·H)-normalized NMI —
  *    the information-theoretic complement to stats_chi2_independence.
  *    Joint/marginal counts are exact integers; the p·ln(p/q) sums go
  *    through dsum (scale-to-int) so aggregation order cannot flap
  *    the last ulp.
  *  - `stats_triggered_analysis` computes the intent-to-treat uplift
  *    next to the triggered-subset uplift (users who actually hit the
  *    feature, here: clicked) and their dilution ratio — the standard
  *    diagnosis for "the ITT effect looks tiny because only 60% were
  *    exposed". Per-user cent-integer outcomes keep it deterministic.
  *  - `stats_mde_power` is the pre-experiment power calculation every
  *    platform runs: per segment, the minimum detectable effect at
  *    α=0.05 / 80% power given the observed variance and arm sizes
  *    ((z₀.₉₇₅+z₀.₈)·SE with the constant pinned to 2.801585 in both
  *    engines), absolute and as % of the mean.
  */
object Wave43Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "vec_ndcg_at_k",
      (s, dir) => {
        graft.functions.VecExprs.register(s)
        val v = T(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), col("label"),
            sqrt(expr("fvdot(embedding, embedding)")).as("nrm"))
          .filter(col("nrm") > 0)
        val q = broadcast(v.filter(col("vec_id") === 0)
          .select(col("embedding").as("eq"), col("nrm").as("nq"),
            col("label").as("ql")))
        val scored = v.filter(col("vec_id") =!= 0)
          .crossJoin(q)
          .select(col("vec_id"),
            dround(expr("fvdot(embedding, eq)") /
              (col("nrm") * col("nq")), 6).as("sim"),
            (col("label") === col("ql")).cast("long").as("rel"))
        val nRel = scored.agg(sum("rel").as("n_rel"))
        val top = scored.orderBy(col("sim").desc, col("vec_id")).limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id"))).cast("long"))
        val dcg = top.agg(
          dsum(col("rel").cast("double") /
            log2(col("rank").cast("double") + 1.0), 9).as("dcg"),
          sum("rel").as("n_rel_topk"))
        // ideal DCG: all min(n_rel, 10) relevant docs ranked first
        dcg.crossJoin(broadcast(nRel))
          .withColumn("k_rel", least(col("n_rel"), lit(10L)))
          .crossJoin(broadcast(s.range(1, 11).select(col("id").as("i"))))
          .filter(col("i") <= col("k_rel"))
          .groupBy("dcg", "n_rel_topk", "n_rel")
          .agg(dsum(lit(1.0) /
            log2(col("i").cast("double") + 1.0), 9).as("idcg"))
          .select(col("n_rel"), col("n_rel_topk"),
            dround(col("dcg"), 6).as("dcg"),
            dround(col("idcg"), 6).as("idcg"),
            dround(col("dcg") / col("idcg"), 6).as("ndcg"))
      },
      Some(
        "WITH v0 AS (SELECT vec_id, embedding, label, sqrt((SELECT " +
          "sum(CAST(x.a AS DOUBLE) * x.a) FROM (SELECT unnest(embedding) " +
          "AS a) x)) AS nrm FROM embeddings), " +
          "v AS (SELECT * FROM v0 WHERE nrm > 0), " +
          "q AS (SELECT embedding AS eq, nrm AS nq, label AS ql FROM v " +
          "WHERE vec_id = 0), " +
          "scored AS (SELECT v.vec_id, " +
          "round((SELECT sum(CAST(z.x AS DOUBLE) * z.y) FROM " +
          "(SELECT unnest(v.embedding) AS x, unnest(q.eq) AS y) z) " +
          "/ (v.nrm * q.nq) * 1e6) / 1e6 AS sim, " +
          "CAST(CASE WHEN v.label = q.ql THEN 1 ELSE 0 END AS BIGINT) " +
          "AS rel FROM v, q WHERE v.vec_id <> 0), " +
          "nr AS (SELECT CAST(sum(rel) AS BIGINT) AS n_rel FROM scored), " +
          "top AS (SELECT vec_id, rel, CAST(row_number() OVER " +
          "(ORDER BY sim DESC, vec_id) AS BIGINT) AS rank FROM scored " +
          "ORDER BY sim DESC, vec_id LIMIT 10), " +
          "d AS (SELECT " +
          dsumSql("CAST(rel AS DOUBLE) / log2(CAST(rank AS DOUBLE) + 1.0)",
            9) + " AS dcg, CAST(sum(rel) AS BIGINT) AS n_rel_topk " +
          "FROM top), " +
          "ide AS (SELECT " +
          dsumSql("CAST(1.0 AS DOUBLE) / log2(CAST(i AS DOUBLE) + 1.0)",
            9) + " AS idcg FROM (SELECT unnest(generate_series(1, 10)) " +
          "AS i), nr WHERE i <= least(n_rel, 10)) " +
          "SELECT n_rel, n_rel_topk, " + droundSql("dcg", 6) +
          " AS dcg, " + droundSql("idcg", 6) + " AS idcg, " +
          droundSql("dcg / idcg", 6) + " AS ndcg FROM d, ide, nr")
    ),
    Q(
      "stats_mutual_information",
      (s, dir) => {
        val joint = T(s, dir, "lineitem")
          .join(broadcast(T(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("x"), col("l_returnflag").as("y"))
          .agg(count(lit(1)).as("nxy"))
        val mx = joint.groupBy("x").agg(sum("nxy").as("nx"))
        val my = joint.groupBy("y").agg(sum("nxy").as("ny"))
        val tot = joint.agg(sum("nxy").as("n"))
        val mi = joint
          .join(broadcast(mx), Seq("x"))
          .join(broadcast(my), Seq("y"))
          .crossJoin(broadcast(tot))
          .agg(
            dsum(col("nxy").cast("double") / col("n") *
              log(col("nxy").cast("double") * col("n") /
                (col("nx").cast("double") * col("ny"))), 12).as("mi"),
            count(lit(1)).as("n_cells"))
        val hx = mx.crossJoin(broadcast(tot))
          .agg(dsum(lit(-1.0) * col("nx") / col("n") *
            log(col("nx").cast("double") / col("n")), 12).as("hx"))
        val hy = my.crossJoin(broadcast(tot))
          .agg(dsum(lit(-1.0) * col("ny") / col("n") *
            log(col("ny").cast("double") / col("n")), 12).as("hy"))
        mi.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
          .select(col("n_cells"),
            dround(col("mi"), 6).as("mi_nats"),
            dround(col("hx"), 6).as("h_x"),
            dround(col("hy"), 6).as("h_y"),
            dround(col("mi") / sqrt(col("hx") * col("hy")), 6).as("nmi"))
      },
      Some(
        "WITH joint AS (SELECT p_brand AS x, l_returnflag AS y, " +
          "CAST(count(*) AS BIGINT) AS nxy FROM lineitem " +
          "JOIN part ON l_partkey = p_partkey GROUP BY 1, 2), " +
          "mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM joint " +
          "GROUP BY 1), " +
          "my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM joint " +
          "GROUP BY 1), " +
          "tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM joint), " +
          "mi AS (SELECT " +
          dsumSql("CAST(nxy AS DOUBLE) / n * ln(CAST(nxy AS DOUBLE) * n " +
            "/ (CAST(nx AS DOUBLE) * ny))", 12) + " AS mi, " +
          "CAST(count(*) AS BIGINT) AS n_cells FROM joint " +
          "JOIN mx USING (x) JOIN my USING (y), tot), " +
          "ex AS (SELECT " +
          dsumSql("-1.0 * CAST(nx AS DOUBLE) / n * " +
            "ln(CAST(nx AS DOUBLE) / n)", 12) +
          " AS hx FROM mx, tot), " +
          "ey AS (SELECT " +
          dsumSql("-1.0 * CAST(ny AS DOUBLE) / n * " +
            "ln(CAST(ny AS DOUBLE) / n)", 12) +
          " AS hy FROM my, tot) " +
          "SELECT n_cells, " + droundSql("mi", 6) + " AS mi_nats, " +
          droundSql("hx", 6) + " AS h_x, " + droundSql("hy", 6) +
          " AS h_y, " + droundSql("mi / sqrt(hx * hy)", 6) +
          " AS nmi FROM mi, ex, ey")
    ),
    Q(
      "stats_triggered_analysis",
      (s, dir) => {
        val ev = T(s, dir, "events").filter(col("user_id").isNotNull)
        val perUser = ev.groupBy("user_id")
          .agg(
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100).cast("long")).otherwise(0L))
              .as("cents"),
            max((col("event_type") === "click").cast("long"))
              .as("triggered"))
          .withColumn("arm", col("user_id") % 2)
        val agg = perUser.groupBy()
          .agg(
            count(lit(1)).as("n_users"),
            sum("triggered").as("n_triggered"),
            sum(when(col("arm") === 1, col("cents"))).as("s1"),
            sum(when(col("arm") === 1, 1L)).as("n1"),
            sum(when(col("arm") === 0, col("cents"))).as("s0"),
            sum(when(col("arm") === 0, 1L)).as("n0"),
            sum(when(col("arm") === 1 && col("triggered") === 1,
              col("cents"))).as("ts1"),
            sum(when(col("arm") === 1 && col("triggered") === 1, 1L))
              .as("tn1"),
            sum(when(col("arm") === 0 && col("triggered") === 1,
              col("cents"))).as("ts0"),
            sum(when(col("arm") === 0 && col("triggered") === 1, 1L))
              .as("tn0"))
        agg.select(
          col("n_users"), col("n_triggered"),
          dround(col("n_triggered").cast("double") / col("n_users"), 4)
            .as("trigger_rate"),
          dround(col("s1").cast("double") / col("n1") / 100.0 -
            col("s0").cast("double") / col("n0") / 100.0, 4)
            .as("itt_uplift"),
          dround(col("ts1").cast("double") / col("tn1") / 100.0 -
            col("ts0").cast("double") / col("tn0") / 100.0, 4)
            .as("triggered_uplift"))
      },
      Some(
        "WITH pu AS (SELECT user_id, " +
          "CAST(sum(CASE WHEN event_type = 'purchase' THEN " +
          "CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) " +
          "AS cents, " +
          "CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS triggered, user_id % 2 AS arm FROM events " +
          "WHERE user_id IS NOT NULL GROUP BY user_id), " +
          "a AS (SELECT CAST(count(*) AS BIGINT) AS n_users, " +
          "CAST(sum(triggered) AS BIGINT) AS n_triggered, " +
          "CAST(sum(CASE WHEN arm = 1 THEN cents END) AS BIGINT) AS s1, " +
          "CAST(sum(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS n1, " +
          "CAST(sum(CASE WHEN arm = 0 THEN cents END) AS BIGINT) AS s0, " +
          "CAST(sum(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS n0, " +
          "CAST(sum(CASE WHEN arm = 1 AND triggered = 1 THEN cents END) " +
          "AS BIGINT) AS ts1, " +
          "CAST(sum(CASE WHEN arm = 1 AND triggered = 1 THEN 1 END) " +
          "AS BIGINT) AS tn1, " +
          "CAST(sum(CASE WHEN arm = 0 AND triggered = 1 THEN cents END) " +
          "AS BIGINT) AS ts0, " +
          "CAST(sum(CASE WHEN arm = 0 AND triggered = 1 THEN 1 END) " +
          "AS BIGINT) AS tn0 FROM pu) " +
          "SELECT n_users, n_triggered, " +
          droundSql("CAST(n_triggered AS DOUBLE) / n_users", 4) +
          " AS trigger_rate, " +
          droundSql("CAST(s1 AS DOUBLE) / n1 / 100.0 - " +
            "CAST(s0 AS DOUBLE) / n0 / 100.0", 4) + " AS itt_uplift, " +
          droundSql("CAST(ts1 AS DOUBLE) / tn1 / 100.0 - " +
            "CAST(ts0 AS DOUBLE) / tn0 / 100.0", 4) +
          " AS triggered_uplift FROM a")
    ),
    Q(
      "stats_mde_power",
      (s, dir) => {
        val per = T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), (col("c_custkey") % 2).as("arm"),
            round(col("o_totalprice")).cast("long").as("d"))
          .groupBy("c_mktsegment")
          .agg(
            sum(when(col("arm") === 0, 1L)).as("n0"),
            sum(when(col("arm") === 1, 1L)).as("n1"),
            count(lit(1)).as("n"),
            sum("d").as("sd"),
            sum(col("d") * col("d")).as("sdd"))
          .withColumn("mean", col("sd").cast("double") / col("n"))
          .withColumn("var_p",
            (col("n").cast("double") * col("sdd") -
              col("sd").cast("double") * col("sd")) /
              (col("n").cast("double") * (col("n") - 1)))
        per.select(col("c_mktsegment"), col("n0"), col("n1"),
            dround(col("mean"), 2).as("mean_value"),
            dround(lit(2.801585) * sqrt(col("var_p") *
              (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 4)
              .as("mde_abs"),
            dround(lit(2.801585) * sqrt(col("var_p") *
              (lit(1.0) / col("n0") + lit(1.0) / col("n1"))) /
              col("mean") * 100.0, 4).as("mde_pct"))
          .orderBy("c_mktsegment")
      },
      Some(
        "WITH per AS (SELECT c_mktsegment, " +
          "CAST(sum(CASE WHEN c_custkey % 2 = 0 THEN 1 END) AS BIGINT) " +
          "AS n0, " +
          "CAST(sum(CASE WHEN c_custkey % 2 = 1 THEN 1 END) AS BIGINT) " +
          "AS n1, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) " +
          "AS sd, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT) * " +
          "CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS sdd " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY 1), " +
          "d AS (SELECT c_mktsegment, n0, n1, " +
          "CAST(sd AS DOUBLE) / n AS mean, " +
          "(CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd) / " +
          "(CAST(n AS DOUBLE) * (n - 1)) AS var_p FROM per) " +
          "SELECT c_mktsegment, n0, n1, " + droundSql("mean", 2) +
          " AS mean_value, " +
          droundSql("2.801585 * sqrt(var_p * (CAST(1.0 AS DOUBLE) / n0 " +
            "+ CAST(1.0 AS DOUBLE) / n1))", 4) + " AS mde_abs, " +
          droundSql("2.801585 * sqrt(var_p * (CAST(1.0 AS DOUBLE) / n0 " +
            "+ CAST(1.0 AS DOUBLE) / n1)) / mean * 100.0", 4) +
          " AS mde_pct FROM d ORDER BY c_mktsegment")
    )
  )
}
