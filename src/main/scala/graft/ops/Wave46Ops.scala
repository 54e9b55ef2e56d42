package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 46: the classical-tests batch.
  *
  *  - `stats_anova_f` is one-way ANOVA across market segments on
  *    order value: between/within sums of squares assembled from
  *    exact cent-integer sums (SSB/SSW via the n·Σx²−(Σx)² identity,
  *    double-combined only at the end), F = (SSB/(k−1))/(SSW/(N−k)).
  *  - `ts_mann_kendall` is the Mann-Kendall trend test on daily
  *    revenue: S = Σ sign(y_j − y_i) over ordered day pairs
  *    (calendar-bounded, like ts_theil_sen — the two are the standard
  *    pairing: MK for "is there a trend", Theil-Sen for "how steep"),
  *    normal approximation z = (S∓1)/√var with the no-ties variance.
  *  - `stats_spearman_rank` is Spearman's ρ between per-customer
  *    order count and revenue: average-tie ranks from one window pass
  *    per variable, then the exact Pearson-on-ranks formula — all
  *    rank sums stay integers (average ranks are n+0.5 halves, so
  *    2·rank is an exact integer; the op scales by 2 to stay exact).
  *  - `stats_runs_test` is the Wald-Wolfowitz runs test for
  *    randomness of the daily revenue up/down sequence — run count
  *    from a lag compare, expected runs 2n₊n₋/n+1 and its variance in
  *    closed form, z-scored. A market-health / data-generation sanity
  *    check next to stats_benford_digits.
  */
object Wave46Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "stats_anova_f",
      (s, dir) => {
        val per = T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"),
            round(col("o_totalprice")).cast("long").as("d"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), sum("d").as("sd"),
            sum(col("d") * col("d")).as("sdd"))
        val tot = per.agg(sum("n").as("nn"), sum("sd").as("tsd"),
          sum("sdd").as("tsdd"), count(lit(1)).as("k"))
        // SSB = Σ_g (Σx_g)²/n_g − (Σx)²/N ; SST = Σx² − (Σx)²/N
        val ssb = per.crossJoin(broadcast(tot))
          .agg(
            // scale 0: Σx_g²/n_g reaches ~7e14 per group at sf0.1 — a
            // 1e4 dsum scale would overflow int64 on the summed terms;
            // integer-dollar² precision is 11 orders below the SSB
            dsum(col("sd").cast("double") * col("sd") / col("n"), 0)
              .as("sgg"),
            first("nn").as("nn"), first("tsd").as("tsd"),
            first("tsdd").as("tsdd"), first("k").as("k"))
          .withColumn("cf",
            col("tsd").cast("double") * col("tsd") / col("nn"))
          .withColumn("ssb", col("sgg") - col("cf"))
          .withColumn("sst", col("tsdd").cast("double") - col("cf"))
          .withColumn("ssw", col("sst") - col("ssb"))
          .withColumn("f",
            (col("ssb") / (col("k").cast("double") - 1)) /
              (col("ssw") / (col("nn").cast("double") - col("k"))))
        ssb.select(col("k").as("n_groups"), col("nn").as("n_total"),
          dround(col("ssb"), 2).as("ss_between"),
          dround(col("ssw"), 2).as("ss_within"),
          dround(col("f"), 4).as("f_stat"),
          (col("f") > 2.372).as("significant_05"))
      },
      Some(
        "WITH per AS (SELECT c_mktsegment, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) " +
          "AS sd, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT) * " +
          "CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS sdd " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY 1), " +
          "tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, " +
          "CAST(sum(sd) AS BIGINT) AS tsd, " +
          "CAST(sum(sdd) AS BIGINT) AS tsdd, " +
          "CAST(count(*) AS BIGINT) AS k FROM per), " +
          "a AS (SELECT " +
          dsumSql("CAST(sd AS DOUBLE) * sd / n", 0) + " AS sgg, " +
          "any_value(nn) AS nn, any_value(tsd) AS tsd, " +
          "any_value(tsdd) AS tsdd, any_value(k) AS k FROM per, tot), " +
          "b AS (SELECT k, nn, " +
          "sgg - CAST(tsd AS DOUBLE) * tsd / nn AS ssb, " +
          "CAST(tsdd AS DOUBLE) - CAST(tsd AS DOUBLE) * tsd / nn " +
          "AS sst FROM a), " +
          "c AS (SELECT k, nn, ssb, sst - ssb AS ssw, " +
          "(ssb / (CAST(k AS DOUBLE) - 1)) / " +
          "((sst - ssb) / (CAST(nn AS DOUBLE) - k)) AS f FROM b) " +
          "SELECT k AS n_groups, nn AS n_total, " +
          droundSql("ssb", 2) + " AS ss_between, " +
          droundSql("ssw", 2) + " AS ss_within, " +
          droundSql("f", 4) + " AS f_stat, " +
          "f > 2.372 AS significant_05 FROM c")
    ),
    Q(
      "ts_mann_kendall",
      (s, dir) => {
        val daily = T(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(sum(round(col("o_totalprice")).cast("long")).as("rev"))
        val sPairs = daily.as("a").join(daily.as("b"),
            col("a.day") < col("b.day"))
          .agg(sum(signum((col("b.rev") - col("a.rev")).cast("double"))
            .cast("long")).as("s"), count(lit(1)).as("n_pairs"))
        val n = daily.agg(count(lit(1)).as("n"))
        sPairs.crossJoin(broadcast(n))
          .withColumn("var_s",
            col("n").cast("double") * (col("n") - 1) *
              (lit(2.0) * col("n") + 5) / 18.0)
          .withColumn("z",
            when(col("s") > 0,
              (col("s").cast("double") - 1) / sqrt(col("var_s")))
              .when(col("s") < 0,
                (col("s").cast("double") + 1) / sqrt(col("var_s")))
              .otherwise(lit(0.0)))
          .select(col("n"), col("s"),
            dround(col("var_s"), 2).as("var_s"),
            dround(col("z"), 4).as("z"),
            (abs(col("z")) > 1.96).as("trend_detected"))
      },
      Some(
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) " +
          "AS rev FROM orders GROUP BY 1), " +
          "sp AS (SELECT CAST(sum(CAST(sign(CAST(b.rev - a.rev " +
          "AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s, " +
          "CAST(count(*) AS BIGINT) AS n_pairs " +
          "FROM daily a JOIN daily b ON a.day < b.day), " +
          "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily), " +
          "v AS (SELECT n, s, " +
          "CAST(n AS DOUBLE) * (n - 1) * (2.0 * n + 5) / 18.0 " +
          "AS var_s FROM sp, nn), " +
          "z AS (SELECT n, s, var_s, CASE " +
          "WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) / sqrt(var_s) " +
          "WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) / sqrt(var_s) " +
          "ELSE 0.0 END AS z FROM v) " +
          "SELECT n, s, " + droundSql("var_s", 2) + " AS var_s, " +
          droundSql("z", 4) + " AS z, abs(z) > 1.96 AS trend_detected " +
          "FROM z")
    ),
    Q(
      "stats_spearman_rank",
      (s, dir) => {
        // per-customer (orders, revenue); average-tie ranks doubled to
        // stay exact integers (avg of consecutive ints is a half)
        val per = T(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("a"),
            sum(round(col("o_totalprice")).cast("long")).as("b"))
        val r2 = per
          .withColumn("ra2",
            (rank().over(Window.orderBy("a")).cast("long") * 2 +
              count(lit(1)).over(Window.partitionBy("a")) - 1))
          .withColumn("rb2",
            (rank().over(Window.orderBy("b")).cast("long") * 2 +
              count(lit(1)).over(Window.partitionBy("b")) - 1))
        // Pearson on 2·rank in the n·Σxy − ΣxΣy form (ints exact,
        // doubles only in the final ratio)
        r2.agg(count(lit(1)).as("n"),
            sum("ra2").as("sx"), sum("rb2").as("sy"),
            sum(col("ra2") * col("ra2")).as("sxx"),
            sum(col("rb2") * col("rb2")).as("syy"),
            sum(col("ra2") * col("rb2")).as("sxy"))
          .withColumn("rho",
            (col("n").cast("double") * col("sxy") -
              col("sx").cast("double") * col("sy")) /
              sqrt((col("n").cast("double") * col("sxx") -
                col("sx").cast("double") * col("sx")) *
                (col("n").cast("double") * col("syy") -
                  col("sy").cast("double") * col("sy"))))
          .select(col("n"), dround(col("rho"), 6).as("spearman_rho"))
      },
      Some(
        "WITH per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS a, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) " +
          "AS b FROM orders GROUP BY 1), " +
          "r AS (SELECT " +
          "CAST(rank() OVER (ORDER BY a) AS BIGINT) * 2 + " +
          "CAST(count(*) OVER (PARTITION BY a) AS BIGINT) - 1 AS ra2, " +
          "CAST(rank() OVER (ORDER BY b) AS BIGINT) * 2 + " +
          "CAST(count(*) OVER (PARTITION BY b) AS BIGINT) - 1 AS rb2 " +
          "FROM per), " +
          "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(ra2) AS BIGINT) AS sx, " +
          "CAST(sum(rb2) AS BIGINT) AS sy, " +
          "CAST(sum(ra2 * ra2) AS BIGINT) AS sxx, " +
          "CAST(sum(rb2 * rb2) AS BIGINT) AS syy, " +
          "CAST(sum(ra2 * rb2) AS BIGINT) AS sxy FROM r) " +
          "SELECT n, " +
          droundSql("(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)" +
            " / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)" +
            " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))",
            6) + " AS spearman_rho FROM m")
    ),
    Q(
      "stats_runs_test",
      (s, dir) => {
        val daily = T(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(sum(round(col("o_totalprice")).cast("long")).as("rev"))
        val w = Window.orderBy("day")
        val steps = daily
          .withColumn("prev", lag("rev", 1).over(w))
          .filter(col("prev").isNotNull && col("rev") =!= col("prev"))
          .withColumn("up", (col("rev") > col("prev")).cast("long"))
        val runs = steps
          .withColumn("pu", lag("up", 1).over(Window.orderBy("day")))
          .withColumn("newrun",
            when(col("pu").isNull || col("pu") =!= col("up"), 1L)
              .otherwise(0L))
          .agg(sum("newrun").as("runs"),
            sum("up").as("n_up"),
            sum(lit(1L) - col("up")).as("n_down"))
        runs
          .withColumn("n", col("n_up") + col("n_down"))
          .withColumn("e_runs",
            lit(2.0) * col("n_up") * col("n_down") / col("n") + 1.0)
          .withColumn("var_runs",
            (col("e_runs") - 1) * (col("e_runs") - 2) /
              (col("n").cast("double") - 1))
          .withColumn("z",
            (col("runs").cast("double") - col("e_runs")) /
              sqrt(col("var_runs")))
          .select(col("n_up"), col("n_down"), col("runs"),
            dround(col("e_runs"), 4).as("expected_runs"),
            dround(col("z"), 4).as("z"),
            (abs(col("z")) > 1.96).as("nonrandom_05"))
      },
      Some(
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) " +
          "AS rev FROM orders GROUP BY 1), " +
          "st AS (SELECT day, rev, lag(rev) OVER (ORDER BY day) " +
          "AS prev FROM daily), " +
          "s2 AS (SELECT day, CAST(CASE WHEN rev > prev THEN 1 ELSE 0 " +
          "END AS BIGINT) AS up FROM st WHERE prev IS NOT NULL AND " +
          "rev <> prev), " +
          "s3 AS (SELECT up, lag(up) OVER (ORDER BY day) AS pu " +
          "FROM s2), " +
          "r AS (SELECT CAST(sum(CASE WHEN pu IS NULL OR pu <> up " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS runs, " +
          "CAST(sum(up) AS BIGINT) AS n_up, " +
          "CAST(sum(1 - up) AS BIGINT) AS n_down FROM s3), " +
          "e AS (SELECT n_up, n_down, runs, n_up + n_down AS n, " +
          "2.0 * CAST(n_up AS DOUBLE) * n_down / (n_up + n_down) + 1.0 " +
          "AS e_runs " +
          "FROM r), " +
          "v AS (SELECT n_up, n_down, runs, e_runs, " +
          "(e_runs - 1) * (e_runs - 2) / (CAST(n AS DOUBLE) - 1) " +
          "AS var_runs FROM e), " +
          "z AS (SELECT n_up, n_down, runs, e_runs, " +
          "(CAST(runs AS DOUBLE) - e_runs) / sqrt(var_runs) AS z " +
          "FROM v) " +
          "SELECT n_up, n_down, runs, " +
          droundSql("e_runs", 4) + " AS expected_runs, " +
          droundSql("z", 4) + " AS z, abs(z) > 1.96 AS nonrandom_05 " +
          "FROM z")
    )
  )
}
