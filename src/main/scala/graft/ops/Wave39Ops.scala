package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 39: time-series downsampling + experimentation health.
  *
  *  - `ts_downsample_lttb` is the parallel variant of
  *    Largest-Triangle-Three-Buckets downsampling: fixed row-index
  *    buckets; each interior bucket keeps the point with the largest
  *    triangle area against its NEIGHBOR BUCKETS' MEAN points (true
  *    LTTB anchors on the previously selected point — a sequential
  *    chain; the mean-anchor approximation is the standard
  *    parallelization and what makes it one window + one argmax on a
  *    cluster). Areas are exact integers (day index × integer counts,
  *    ×2-scaled), so selection is deterministic in both engines.
  *  - `stats_srm_check` is the sample-ratio-mismatch health check every
  *    A/B platform runs before reading an experiment: users hash into
  *    two arms (the same affine hash mod 2^31−1 the KMV sketch uses —
  *    engine-replayable), and a χ² test against the declared 50/50
  *    split flags broken assignment (χ² > 3.841 at α=0.05, df=1).
  *  - `agg_ratio_delta_ci` is the delta-method confidence interval for
  *    a RATIO metric (revenue per order, by segment): per-customer
  *    (x=revenue, y=orders) sums feed var(x/y) ≈ (σx² + r²σy² −
  *    2rσxy)/(n·ȳ²) — the correct CI when the denominator is itself
  *    random, which a naive per-order mean silently gets wrong. Exact
  *    dollar-integer sums, double-combined like `stats_cuped`.
  */
object Wave39Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "ts_downsample_lttb",
      (s, dir) => {
        // daily order counts: the series (x = dense day index, y = n)
        val daily = T(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(count(lit(1)).as("y"))
        val idx = daily
          .withColumn("x", (row_number().over(Window.orderBy("day")) - 1)
            .cast("long"))
          .withColumn("b", (col("x") / 8).cast("long"))
        // neighbor-bucket mean anchors (2x-scaled to stay integer):
        // sums and counts per bucket, joined to b±1
        val bm = idx.groupBy("b")
          .agg(sum("x").as("sx"), sum("y").as("sy"),
            count(lit(1)).as("bn"))
        val withAnchors = idx
          .join(bm.select((col("b") + 1).as("b"), col("sx").as("axs"),
            col("sy").as("ays"), col("bn").as("an")), Seq("b"))
          .join(bm.select((col("b") - 1).as("b"), col("sx").as("cxs"),
            col("sy").as("cys"), col("bn").as("cn")), Seq("b"))
        // 2*area*an*cn (all-integer cross product — no division, no
        // doubles): |(xA-xC)(yB-yA) - (xA-xB)(yA-yC)| with A/C the
        // anchor means, scaled through by their counts
        val area2 = abs(
          (col("axs") * col("cn") - col("cxs") * col("an")) *
            (col("y") * col("an") - col("ays")) -
            (col("axs") - col("x") * col("an")) *
              (col("ays") * col("cn") - col("cys") * col("an")))
        val picked = withAnchors
          .withColumn("a2", area2)
          .withColumn("rk", row_number().over(Window.partitionBy("b")
            .orderBy(col("a2").desc, col("x"))))
          .filter(col("rk") === 1)
        picked.select(col("b"), col("day"), col("y"))
          .orderBy("b")
      },
      Some(
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, " +
          "CAST(count(*) AS BIGINT) AS y FROM orders GROUP BY 1), " +
          "idx AS (SELECT day, y, CAST(row_number() OVER (ORDER BY day) " +
          "- 1 AS BIGINT) AS x FROM daily), " +
          "bi AS (SELECT day, y, x, x // 8 AS b FROM idx), " +
          "bm AS (SELECT b, CAST(sum(x) AS BIGINT) AS sx, " +
          "CAST(sum(y) AS BIGINT) AS sy, CAST(count(*) AS BIGINT) AS bn " +
          "FROM bi GROUP BY b), " +
          "wa AS (SELECT bi.*, a.sx AS axs, a.sy AS ays, a.bn AS an, " +
          "c.sx AS cxs, c.sy AS cys, c.bn AS cn " +
          "FROM bi JOIN bm a ON a.b = bi.b - 1 " +
          "JOIN bm c ON c.b = bi.b + 1), " +
          "ar AS (SELECT b, day, y, x, abs(" +
          "(axs * cn - cxs * an) * (y * an - ays) - " +
          "(axs - x * an) * (ays * cn - cys * an)) AS a2 FROM wa), " +
          "pk AS (SELECT b, day, y, row_number() OVER (PARTITION BY b " +
          "ORDER BY a2 DESC, x) AS rk FROM ar) " +
          "SELECT b, day, y FROM pk WHERE rk = 1 ORDER BY b")
    ),
    Q(
      "stats_srm_check",
      (s, dir) => {
        val arms = T(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .select(col("user_id")).distinct()
          .withColumn("arm",
            expr("(1103515245 * (user_id % 2147483647) + 12345) " +
              "% 2147483647 % 2"))
          .groupBy("arm").agg(count(lit(1)).as("n"))
        val tot = arms.agg(sum("n").as("total"))
        arms.crossJoin(broadcast(tot))
          .withColumn("expected", col("total").cast("double") / 2)
          .withColumn("chi2_part",
            (col("n") - col("expected")) * (col("n") - col("expected")) /
              col("expected"))
          .groupBy()
          .agg(sum(when(col("arm") === 0, col("n"))).as("n_arm0"),
            sum(when(col("arm") === 1, col("n"))).as("n_arm1"),
            dround(sum("chi2_part"), 6).as("chi2"))
          .withColumn("srm_detected", col("chi2") > lit(3.841))
      },
      Some(
        "WITH arms AS (SELECT " +
          "(1103515245 * (user_id % 2147483647) + 12345) " +
          "% 2147483647 % 2 AS arm, CAST(count(*) AS BIGINT) AS n " +
          "FROM (SELECT DISTINCT user_id FROM events " +
          "WHERE user_id IS NOT NULL) GROUP BY 1), " +
          "tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM arms), " +
          "x AS (SELECT arm, n, CAST(total AS DOUBLE) / 2 AS expected " +
          "FROM arms, tot) " +
          "SELECT CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) " +
          "AS n_arm0, " +
          "CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_arm1, " +
          droundSql("sum((n - expected) * (n - expected) / expected)", 6) +
          " AS chi2, " +
          droundSql("sum((n - expected) * (n - expected) / expected)", 6) +
          " > 3.841 AS srm_detected FROM x")
    ),
    Q(
      "agg_ratio_delta_ci",
      (s, dir) => {
        // per-customer (x = dollars, y = orders): the ratio's unit of
        // randomization is the CUSTOMER, so the CI must be too
        val per = T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_mktsegment")
          .agg(sum(round(col("o_totalprice")).cast("long")).as("x"),
            count(lit(1)).as("y"))
        per.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
          .withColumn("r", col("sx").cast("double") / col("sy"))
          .withColumn("ybar", col("sy").cast("double") / col("n"))
          // sample (co)variances in double: n*S - S*S overflows int64
          .withColumn("vx",
            (col("n").cast("double") * col("sxx") -
              col("sx").cast("double") * col("sx")) /
              (col("n").cast("double") * (col("n") - 1)))
          .withColumn("vy",
            (col("n").cast("double") * col("syy") -
              col("sy").cast("double") * col("sy")) /
              (col("n").cast("double") * (col("n") - 1)))
          .withColumn("cxy",
            (col("n").cast("double") * col("sxy") -
              col("sx").cast("double") * col("sy")) /
              (col("n").cast("double") * (col("n") - 1)))
          .withColumn("se", sqrt(
            (col("vx") + col("r") * col("r") * col("vy") -
              lit(2.0) * col("r") * col("cxy")) /
              (col("n") * col("ybar") * col("ybar"))))
          .select(col("c_mktsegment"), col("n"),
            dround(col("r"), 6).as("ratio"),
            dround(col("r") - lit(1.96) * col("se"), 6).as("ci_lo"),
            dround(col("r") + lit(1.96) * col("se"), 6).as("ci_hi"))
          .orderBy("c_mktsegment")
      },
      Some(
        "WITH per AS (SELECT c_custkey, c_mktsegment, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x, " +
          "CAST(count(*) AS BIGINT) AS y FROM orders " +
          "JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY c_custkey, c_mktsegment), " +
          "m AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
          "CAST(sum(x * x) AS BIGINT) AS sxx, " +
          "CAST(sum(y * y) AS BIGINT) AS syy, " +
          "CAST(sum(x * y) AS BIGINT) AS sxy FROM per " +
          "GROUP BY c_mktsegment), " +
          "d AS (SELECT c_mktsegment, n, " +
          "CAST(sx AS DOUBLE) / sy AS r, " +
          "CAST(sy AS DOUBLE) / n AS ybar, " +
          "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / " +
          "(CAST(n AS DOUBLE) * (n - 1)) AS vx, " +
          "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / " +
          "(CAST(n AS DOUBLE) * (n - 1)) AS vy, " +
          "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
          "(CAST(n AS DOUBLE) * (n - 1)) AS cxy FROM m), " +
          "e AS (SELECT c_mktsegment, n, r, " +
          "sqrt((vx + r * r * vy - 2.0 * r * cxy) / (n * ybar * ybar)) " +
          "AS se FROM d) " +
          "SELECT c_mktsegment, n, " + droundSql("r", 6) + " AS ratio, " +
          droundSql("r - 1.96 * se", 6) + " AS ci_lo, " +
          droundSql("r + 1.96 * se", 6) + " AS ci_hi " +
          "FROM e ORDER BY c_mktsegment")
    )
  )
}
