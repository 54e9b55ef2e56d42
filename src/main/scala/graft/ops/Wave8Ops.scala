package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 8: the drift-detection statistics a production pipeline
  * gates on.
  *
  *  - `stats_ks_drift`: two-sample Kolmogorov–Smirnov distance between the
  *    purchase and click value distributions. The statistic is computed in
  *    INTEGER arithmetic — at each distinct value, |c1·n2 − c2·n1| over the
  *    running counts — so there is no float CDF anywhere and both engines
  *    agree exactly; only the final D/(n1·n2) division is floating. The
  *    running counts use the sharded prefix-sum pattern (local window per
  *    value shard + broadcast shard prefix totals), NOT a no-partition
  *    window — the global-ordered scan stays distributed.
  *  - `stats_chi2_independence`: chi² of the event_type × hour-of-day
  *    contingency table from BIGINT counts; each cell's (O−E)²/E is
  *    quantized to 1e6 and summed as integers, so partial-agg order can't
  *    perturb the total.
  */
object Wave8Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "stats_ks_drift",
      (s, dir) => {
        val ev = T(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("value").as("v"),
            (col("event_type") === "purchase").as("is_a"))
        // per distinct value: counts of each sample
        val perV = ev.groupBy("v")
          .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
            sum(when(!col("is_a"), 1L).otherwise(0L)).as("nb"))
        // 32 uniform value shards; running sums are local per shard, and
        // each shard adds the broadcast total of all lower shards — the
        // distributed prefix-sum (no single-partition window anywhere)
        val mm = perV.agg(min("v"), max("v")).collect()(0)
        val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
        val width = math.max((hi - lo) / 32.0, 1e-9)
        val sharded = perV.withColumn("shard",
          least(floor((col("v") - lo) / width).cast("long"), lit(31L)))
        val local = Window.partitionBy("shard").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val prefixes = sharded.groupBy("shard")
          .agg(sum("na").as("sa"), sum("nb").as("sb"))
        val wPrev = Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)
        // the prefix frame is 32 rows — the window below runs on a frame
        // that fits one task no matter the data volume
        val prev = prefixes
          .withColumn("pa", coalesce(sum("sa").over(wPrev), lit(0L)))
          .withColumn("pb", coalesce(sum("sb").over(wPrev), lit(0L)))
          .select("shard", "pa", "pb")
        val totals = ev.agg(
          sum(when(col("is_a"), 1L).otherwise(0L)),
          sum(when(!col("is_a"), 1L).otherwise(0L))).collect()(0)
        val (n1, n2) = (totals.getLong(0), totals.getLong(1))
        sharded
          .withColumn("ca", sum("na").over(local))
          .withColumn("cb", sum("nb").over(local))
          .join(broadcast(prev), "shard")
          .select(abs((col("ca") + col("pa")) * n2 -
            (col("cb") + col("pb")) * n1).as("dint"))
          .agg(max("dint").as("d_scaled"))
          .select(col("d_scaled"),
            lit(n1).as("n1"), lit(n2).as("n2"),
            (round(col("d_scaled") / (n1.toDouble * n2) * 1e6) / 1e6)
              .as("ks"))
      },
      Some(
        "WITH ev AS (SELECT value AS v, event_type = 'purchase' AS is_a " +
          "FROM events WHERE event_type IN ('purchase', 'click')), " +
          "t AS (SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n1, " +
          "sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n2 FROM ev), " +
          "perv AS (SELECT v, " +
          "sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS na, " +
          "sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS nb " +
          "FROM ev GROUP BY v), " +
          "c AS (SELECT v, sum(na) OVER w AS ca, sum(nb) OVER w AS cb " +
          "FROM perv WINDOW w AS (ORDER BY v " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
          "SELECT CAST(max(abs(ca * (SELECT n2 FROM t) - " +
          "cb * (SELECT n1 FROM t))) AS BIGINT) AS d_scaled, " +
          "CAST((SELECT n1 FROM t) AS BIGINT) AS n1, " +
          "CAST((SELECT n2 FROM t) AS BIGINT) AS n2, " +
          "round(max(abs(ca * (SELECT n2 FROM t) - " +
          "cb * (SELECT n1 FROM t))) " +
          "/ (CAST((SELECT n1 FROM t) AS DOUBLE) * (SELECT n2 FROM t)) " +
          "* 1e6) / 1e6 AS ks FROM c")
    ),
    Q(
      "stats_mannwhitney_u",
      // Mann–Whitney U between the purchase and click value samples —
      // the nonparametric location test. With ties averaged, 2·R1 is
      // always integral: per distinct value, sample A's rank-sum
      // contribution is na·(2·prev + na + nb + 1) where prev is the
      // count of strictly smaller observations — so U is computed
      // EXACTLY in BIGINTs via the same sharded prefix-sum machinery as
      // stats_ks_drift (no single-partition window), and only the final
      // normalization divides.
      (s, dir) => {
        val ev = T(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("value").as("v"),
            (col("event_type") === "purchase").as("is_a"))
        val perV = ev.groupBy("v")
          .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
            sum(when(!col("is_a"), 1L).otherwise(0L)).as("nb"))
        val mm = perV.agg(min("v"), max("v")).collect()(0)
        val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
        val width = math.max((hi - lo) / 32.0, 1e-9)
        val sharded = perV.withColumn("shard",
          least(floor((col("v") - lo) / width).cast("long"), lit(31L)))
        val local = Window.partitionBy("shard").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        val prefixes = sharded.groupBy("shard")
          .agg((sum("na") + sum("nb")).as("st"))
        val wPrev = Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)
        val prev = prefixes
          .withColumn("pt", coalesce(sum("st").over(wPrev), lit(0L)))
          .select("shard", "pt")
        val totals = ev.agg(
          sum(when(col("is_a"), 1L).otherwise(0L)),
          sum(when(!col("is_a"), 1L).otherwise(0L))).collect()(0)
        val (n1, n2) = (totals.getLong(0), totals.getLong(1))
        val r2sum = sharded
          .withColumn("lpt",
            coalesce(sum(col("na") + col("nb")).over(local), lit(0L)))
          .join(broadcast(prev), "shard")
          .select((col("na") * (lit(2L) * (col("lpt") + col("pt")) +
            col("na") + col("nb") + 1L)).as("r2"))
          .agg(sum("r2")).collect()(0).getLong(0)
        // U1 = R1 - n1(n1+1)/2; emit 2·U1 (integral even with ties)
        val u2 = r2sum - n1 * (n1 + 1)
        T(s, dir, "events").limit(1).select(
          lit(n1).as("n1"), lit(n2).as("n2"),
          lit(u2).as("u2_scaled"),
          lit(math.round(u2.toDouble / (2.0 * n1 * n2) * 1e6) / 1e6)
            .as("u_norm"))
      },
      Some(
        "WITH ev AS (SELECT value AS v, event_type = 'purchase' AS is_a " +
          "FROM events WHERE event_type IN ('purchase', 'click')), " +
          "t AS (SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n1, " +
          "sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n2 FROM ev), " +
          "perv AS (SELECT v, " +
          "sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS na, " +
          "sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS nb " +
          "FROM ev GROUP BY v), " +
          "c AS (SELECT v, na, nb, coalesce(sum(na + nb) OVER " +
          "(ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)" +
          ", 0) AS prev FROM perv), " +
          "r AS (SELECT sum(na * (2 * prev + na + nb + 1)) AS r2 FROM c) " +
          "SELECT CAST((SELECT n1 FROM t) AS BIGINT) AS n1, " +
          "CAST((SELECT n2 FROM t) AS BIGINT) AS n2, " +
          "CAST((SELECT r2 FROM r) - (SELECT n1 FROM t) * " +
          "((SELECT n1 FROM t) + 1) AS BIGINT) AS u2_scaled, " +
          "round(CAST((SELECT r2 FROM r) - (SELECT n1 FROM t) * " +
          "((SELECT n1 FROM t) + 1) AS DOUBLE) / " +
          "(2.0 * (SELECT n1 FROM t) * (SELECT n2 FROM t)) * 1e6) / 1e6 " +
          "AS u_norm")
    ),
    Q(
      "stats_ab_uplift",
      // A/B exposure analysis with a funnel conversion metric: users
      // split into arms by id parity; a user converts if a purchase
      // lands within 6 hours of their FIRST click. Per-arm rates,
      // absolute uplift, and the two-proportion z statistic all come
      // from four BIGINT counts through one closed-form double
      // expression written identically in both engines.
      (s, dir) => {
        val ev = T(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_type"), col("ts"))
        val fc = ev.filter(col("event_type") === "click")
          .groupBy("user_id").agg(min("ts").as("fc"))
        val conv = ev.filter(col("event_type") === "purchase")
          .join(fc, "user_id")
          .filter(col("ts") > col("fc") &&
            col("ts") <= col("fc") + expr("INTERVAL 6 HOURS"))
          .select("user_id").distinct()
          .withColumn("converted", lit(1L))
        val arms = fc.join(conv, Seq("user_id"), "left")
          .groupBy((col("user_id") % 2 === 0).as("arm_a"))
          .agg(count(lit(1)).as("n"),
            sum(coalesce(col("converted"), lit(0L))).as("conv"))
          .collect().map(r => r.getBoolean(0) ->
            (r.getLong(1), r.getLong(2))).toMap
        val (na, ca) = arms(true)
        val (nb, cb) = arms(false)
        val pa = ca.toDouble / na
        val pb = cb.toDouble / nb
        val pool = (ca + cb).toDouble / (na + nb)
        val z = (pa - pb) /
          math.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
        T(s, dir, "events").limit(1).select(
          lit(na).as("n_a"), lit(nb).as("n_b"),
          lit(math.round(pa * 1e6) / 1e6).as("rate_a"),
          lit(math.round(pb * 1e6) / 1e6).as("rate_b"),
          lit(math.round((pa - pb) * 1e6) / 1e6).as("uplift"),
          lit(math.round(z * 1e6) / 1e6).as("z_score"))
      },
      Some(
        "WITH fc AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS fc " +
          "FROM events WHERE event_type = 'click' GROUP BY user_id), " +
          "conv AS (SELECT DISTINCT e.user_id FROM events e " +
          "JOIN fc ON e.user_id = fc.user_id " +
          "WHERE e.event_type = 'purchase' " +
          "AND CAST(e.ts AS TIMESTAMP) > fc.fc " +
          "AND CAST(e.ts AS TIMESTAMP) <= fc.fc + INTERVAL 6 HOUR), " +
          "m AS (SELECT fc.user_id % 2 = 0 AS arm_a, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS conv FROM fc " +
          "LEFT JOIN conv ON fc.user_id = conv.user_id GROUP BY 1), " +
          "a AS (SELECT * FROM m WHERE arm_a), " +
          "b AS (SELECT * FROM m WHERE NOT arm_a) " +
          "SELECT a.n AS n_a, b.n AS n_b, " +
          "round(CAST(a.conv AS DOUBLE) / a.n * 1e6) / 1e6 AS rate_a, " +
          "round(CAST(b.conv AS DOUBLE) / b.n * 1e6) / 1e6 AS rate_b, " +
          "round((CAST(a.conv AS DOUBLE) / a.n - " +
          "CAST(b.conv AS DOUBLE) / b.n) * 1e6) / 1e6 AS uplift, " +
          "round((CAST(a.conv AS DOUBLE) / a.n - " +
          "CAST(b.conv AS DOUBLE) / b.n) / " +
          "sqrt((CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n)) * " +
          "(1 - CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n)) * " +
          "(1.0 / a.n + 1.0 / b.n)) * 1e6) / 1e6 AS z_score " +
          "FROM a, b")
    ),
    Q(
      "stats_chi2_independence",
      (s, dir) => {
        val obs = T(s, dir, "events")
          .groupBy(col("event_type"), hour(col("ts")).as("h"))
          .agg(count(lit(1)).as("o"))
        val rowT = obs.groupBy("event_type").agg(sum("o").as("rt"))
        val colT = obs.groupBy("h").agg(sum("o").as("ct"))
        val n = obs.agg(sum("o")).collect()(0).getLong(0)
        obs.join(broadcast(rowT), "event_type")
          .join(broadcast(colT), "h")
          .select((round(
            pow(col("o") - col("rt") * col("ct") / n.toDouble, 2) /
              (col("rt") * col("ct") / n.toDouble) * 1e6).cast("long"))
            .as("contrib"),
            lit(1L).as("one"))
          .agg(count(col("one")).as("n_cells"),
            (sum(col("contrib")) / 1e6).as("chi2"))
          .select(col("n_cells"),
            (round(col("chi2") * 1e6) / 1e6).as("chi2"))
      },
      Some(
        "WITH obs AS (SELECT event_type, " +
          "CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS h, " +
          "count(*) AS o FROM events GROUP BY 1, 2), " +
          "rt AS (SELECT event_type, sum(o) AS rt FROM obs GROUP BY 1), " +
          "ct AS (SELECT h, sum(o) AS ct FROM obs GROUP BY 1), " +
          "n AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM obs), " +
          "cells AS (SELECT CAST(round(" +
          "pow(o - rt.rt * ct.ct / (SELECT n FROM n), 2) " +
          "/ (rt.rt * ct.ct / (SELECT n FROM n)) * 1e6) AS BIGINT) " +
          "AS contrib FROM obs " +
          "JOIN rt ON obs.event_type = rt.event_type " +
          "JOIN ct ON obs.h = ct.h) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_cells, " +
          "round(sum(contrib) / 1e6 * 1e6) / 1e6 AS chi2 FROM cells")
    )
  )
}
