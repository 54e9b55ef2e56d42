package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 45: feature encoding, spectra, privacy, inequality.
  *
  *  - `data_target_encoding` is leave-one-out target encoding with
  *    additive (m-estimate) smoothing — the categorical-feature
  *    workhorse. For a binary target the LOO value collapses to a
  *    closed form per category ((k−1)/(n−1) for positives, k/(n−1)
  *    for negatives), so the op emits the exact per-category encode
  *    table instead of touching every row twice — the broadcastable
  *    artifact a feature pipeline actually ships.
  *  - `ts_periodogram` probes the daily-order series at candidate
  *    periods (3/5/7/14/30 days) with one DFT bin each: power =
  *    (Σy·cos)² + (Σy·sin)², normalized by the series' variance-sum —
  *    the weekly cycle pops out. The double sums go through dsum; the
  *    series is calendar-bounded.
  *  - `data_l_diversity` is the l-diversity audit that complements
  *    k-anonymity (data_kanon_suppress): per quasi-identifier group
  *    (segment × nation), the count of DISTINCT sensitive values
  *    (order priority) — groups below l=3 leak the sensitive
  *    attribute even when k-anonymous.
  *  - `stats_theil_decomposition` decomposes customer-revenue
  *    inequality into between-segment and within-segment Theil-T
  *    components (T = Σ(x/X)·ln((x/X)/(1/N)) in its share form) —
  *    additively decomposable where Gini is not, which is why
  *    concentration dashboards use it. Exact integer revenue; dsum'd
  *    double sums.
  */
object Wave45Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "data_target_encoding",
      (s, dir) => {
        val m = 50.0
        val per = T(s, dir, "lineitem")
          .join(broadcast(T(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            sum((col("l_returnflag") === "R").cast("long")).as("k"))
        val glob = per.agg(sum("k").as("gk"), sum("n").as("gn"))
          .withColumn("p_g", col("gk").cast("double") / col("gn"))
        per.crossJoin(broadcast(glob.select("p_g")))
          .select(col("p_brand"), col("n"), col("k"),
            dround((col("k").cast("double") + lit(m) * col("p_g")) /
              (col("n").cast("double") + m), 6).as("smoothed"),
            dround((col("k").cast("double") - 1.0) /
              (col("n").cast("double") - 1.0), 6).as("loo_if_pos"),
            dround(col("k").cast("double") /
              (col("n").cast("double") - 1.0), 6).as("loo_if_neg"))
          .orderBy("p_brand")
      },
      Some(
        "WITH per AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS k FROM lineitem " +
          "JOIN part ON l_partkey = p_partkey GROUP BY 1), " +
          "g AS (SELECT CAST(sum(k) AS DOUBLE) / sum(n) AS p_g " +
          "FROM per) " +
          "SELECT p_brand, n, k, " +
          droundSql("(CAST(k AS DOUBLE) + 50.0 * p_g) / " +
            "(CAST(n AS DOUBLE) + 50.0)", 6) + " AS smoothed, " +
          droundSql("(CAST(k AS DOUBLE) - 1.0) / " +
            "(CAST(n AS DOUBLE) - 1.0)", 6) + " AS loo_if_pos, " +
          droundSql("CAST(k AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)", 6) +
          " AS loo_if_neg FROM per, g ORDER BY p_brand")
    ),
    Q(
      "ts_periodogram",
      (s, dir) => {
        val daily = T(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(count(lit(1)).as("y"))
        val idx = daily.withColumn("t",
          (row_number().over(Window.orderBy("day")) - 1).cast("long"))
        val periods = s.createDataFrame(
          Seq(3L, 5L, 7L, 14L, 30L).map(Tuple1(_)))
          .toDF("period")
        idx.crossJoin(broadcast(periods))
          .withColumn("ang", lit(2.0) * lit(math.Pi) *
            col("t").cast("double") / col("period"))
          .groupBy("period")
          .agg(
            dsum(col("y").cast("double") * cos(col("ang")), 6).as("sc"),
            dsum(col("y").cast("double") * sin(col("ang")), 6).as("ss"),
            count(lit(1)).as("n"),
            sum("y").as("sy"),
            sum(col("y") * col("y")).as("syy"))
          .withColumn("power",
            col("sc") * col("sc") + col("ss") * col("ss"))
          // normalize by n · Σ(y−ȳ)² = n·Σy² − (Σy)² (exact ints)
          .withColumn("denom",
            col("n").cast("double") * col("syy") -
              col("sy").cast("double") * col("sy"))
          .select(col("period"),
            dround(col("power"), 2).as("power"),
            dround(col("power") / col("denom") * col("n"), 6)
              .as("power_ratio"))
          .orderBy("period")
      },
      Some(
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, " +
          "CAST(count(*) AS BIGINT) AS y FROM orders GROUP BY 1), " +
          "idx AS (SELECT y, CAST(row_number() OVER (ORDER BY day) - 1 " +
          "AS BIGINT) AS t FROM daily), " +
          "p AS (SELECT unnest([3, 5, 7, 14, 30]) AS period), " +
          "a AS (SELECT CAST(period AS BIGINT) AS period, " +
          dsumSql("CAST(y AS DOUBLE) * " +
            "cos(2.0 * pi() * CAST(t AS DOUBLE) / period)", 6) +
          " AS sc, " +
          dsumSql("CAST(y AS DOUBLE) * " +
            "sin(2.0 * pi() * CAST(t AS DOUBLE) / period)", 6) +
          " AS ss, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(y) AS BIGINT) AS sy, " +
          "CAST(sum(y * y) AS BIGINT) AS syy " +
          "FROM idx, p GROUP BY period), " +
          "b AS (SELECT period, sc * sc + ss * ss AS power, " +
          "CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS denom, " +
          "n FROM a) " +
          "SELECT period, " + droundSql("power", 2) + " AS power, " +
          droundSql("power / denom * n", 6) + " AS power_ratio " +
          "FROM b ORDER BY period")
    ),
    Q(
      "data_l_diversity",
      (s, dir) => {
        val g = T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment", "c_nationkey")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct("o_orderpriority").as("l"))
        g.agg(
            count(lit(1)).as("n_groups"),
            min("l").as("min_l"),
            sum((col("l") < 3).cast("long")).as("n_below_3"),
            sum(when(col("l") < 3, col("n_rows")).otherwise(0L))
              .as("rows_at_risk"))
          .withColumn("pct_groups_failing", dround(
            col("n_below_3").cast("double") / col("n_groups") * 100, 4))
      },
      Some(
        "WITH g AS (SELECT c_mktsegment, c_nationkey, " +
          "CAST(count(*) AS BIGINT) AS n_rows, " +
          "CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY 1, 2) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_groups, " +
          "CAST(min(l) AS BIGINT) AS min_l, " +
          "CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_below_3, " +
          "CAST(sum(CASE WHEN l < 3 THEN n_rows ELSE 0 END) AS BIGINT) " +
          "AS rows_at_risk, " +
          droundSql("CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) " +
            "AS DOUBLE) / count(*) * 100", 4) +
          " AS pct_groups_failing FROM g")
    ),
    Q(
      "stats_theil_decomposition",
      (s, dir) => {
        val per = T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_mktsegment")
          .agg(sum(round(col("o_totalprice")).cast("long")).as("x"))
        val tot = per.agg(sum("x").as("xx"), count(lit(1)).as("nn"))
        // T_total = Σ (x/X)·ln(N·x/X); group term carries the same form
        // over group totals; T_within = Σ_g (X_g/X)·T_g
        val withTot = per.crossJoin(broadcast(tot))
        val tTotal = withTot.agg(dsum(
          col("x").cast("double") / col("xx") *
            log(col("nn").cast("double") * col("x") / col("xx")), 12)
          .as("t_total"))
        val grp = per.groupBy("c_mktsegment")
          .agg(sum("x").as("xg"), count(lit(1)).as("ng"))
        val tBetween = grp.crossJoin(broadcast(tot))
          .agg(dsum(col("xg").cast("double") / col("xx") *
            log(col("nn").cast("double") * col("xg") /
              (col("ng").cast("double") * col("xx"))), 12)
            .as("t_between"))
        tTotal.crossJoin(tBetween)
          .select(
            dround(col("t_total"), 6).as("t_total"),
            dround(col("t_between"), 6).as("t_between"),
            dround(col("t_total") - col("t_between"), 6)
              .as("t_within"))
      },
      Some(
        "WITH per AS (SELECT c_custkey, c_mktsegment, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) " +
          "AS x FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY 1, 2), " +
          "tot AS (SELECT CAST(sum(x) AS BIGINT) AS xx, " +
          "CAST(count(*) AS BIGINT) AS nn FROM per), " +
          "tt AS (SELECT " +
          dsumSql("CAST(x AS DOUBLE) / xx * " +
            "ln(CAST(nn AS DOUBLE) * x / xx)", 12) +
          " AS t_total FROM per, tot), " +
          "grp AS (SELECT c_mktsegment, CAST(sum(x) AS BIGINT) AS xg, " +
          "CAST(count(*) AS BIGINT) AS ng FROM per GROUP BY 1), " +
          "tb AS (SELECT " +
          dsumSql("CAST(xg AS DOUBLE) / xx * " +
            "ln(CAST(nn AS DOUBLE) * xg / (CAST(ng AS DOUBLE) * xx))",
            12) + " AS t_between FROM grp, tot) " +
          "SELECT " + droundSql("t_total", 6) + " AS t_total, " +
          droundSql("t_between", 6) + " AS t_between, " +
          droundSql("t_total - t_between", 6) + " AS t_within " +
          "FROM tt, tb")
    )
  )
}
