package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 30: bootstrap uncertainty, sequence-regex funnels,
  * rolling medians, and Kalman smoothing.
  *
  *  - `stats_poisson_bootstrap` is the DISTRIBUTED bootstrap: classical
  *    resampling needs n draws from n rows (a shuffle per replica), but
  *    Poisson(1) weights approximate multinomial resampling map-side —
  *    each row carries its own replica weights, so B=50 replicas cost one
  *    map-side explode plus ONE aggregate keyed by (group, replica).
  *    Weights come from an explicit integer LCG (not rand()) so both
  *    engines replay the identical resample; the replica means are pinned
  *    to a 1e-6 grid before the percentile so the CI interpolates exact
  *    integers.
  *  - `events_seq_regex` is sequence matching as regex-over-journey: the
  *    per-user event history collapses to a 1-char-per-event string (one
  *    grouped aggregate), and funnel questions become `rlike` patterns —
  *    the cheap alternative to CEP when the whole history fits a string.
  *  - `win_rolling_median` pins EXACT `percentile()` as a windowed
  *    aggregate (7-row trailing median of daily revenue per event type) —
  *    the robust-trend counterpart of `win_moving_avg`; integer cents in,
  *    so the interpolated median is portable bit-for-bit.
  *  - `ts_kalman_1d` is the local-level Kalman filter (state x_t = x_{t-1}
  *    + w, observation y_t = x_t + v): predict/update with evolving gain
  *    K_t = P/(P+r) per hourly series, folded sequentially inside
  *    `flatMapGroups` — parallel ACROSS series like the RC recurrences
  *    (spec-checked: pure-Scala replay + steady-state gain convergence;
  *    the gain recurrence is not SQL-expressible without a recursive CTE
  *    on non-dyadic divisions).
  */
object Wave30Ops extends QueryModule {

  private val pCdf = Seq( // Poisson(1) CDF at k = 0..4; k = 5 is the tail
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563)

  def queries: Seq[Q] = Seq(
    Q(
      "stats_poisson_bootstrap",
      (s, dir) => {
        val wExpr = pCdf.zipWithIndex.foldRight(lit(5)) {
          case ((c, k), e) => when(col("u") < c, k).otherwise(e)
        }.cast("long")
        val reps = T(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
          .withColumn("b", explode(sequence(lit(1), lit(50))))
          // the replica index must change the PER-ROW mix, not just add a
          // constant offset (a pure shift leaves every replica drawing the
          // same weights): b enters the multiplier as well as the offset
          .withColumn("u",
            ((col("event_id") * (lit(1103515245L) + col("b") * 2L)
              + col("b") * 1013904223L + 6789L)
              % 2147483647L).cast("double") / 2147483647.0)
          .withColumn("w", wExpr)
          .groupBy("event_type", "b")
          .agg((sum(col("w") * col("cents")) * 1000000L).as("ws"),
            sum("w").as("wc"))
          // replica mean on a 1e-6 cent grid: exact int64 → exact double
          .select(col("event_type"),
            round(col("ws") / col("wc")).cast("long").as("rmi"))
        reps.groupBy("event_type")
          .agg(
            count(lit(1)).as("n_boot"),
            dround(avg(col("rmi")) / 1e8, 4).as("boot_mean"),
            dround(expr("percentile(rmi, 0.05)") / 1e8, 4).as("ci_lo"),
            dround(expr("percentile(rmi, 0.95)") / 1e8, 4).as("ci_hi"))
          .orderBy("event_type")
      },
      Some(
        "WITH reps AS (SELECT event_type, b, " +
          "CAST(round(sum(w * cents) * 1000000 / sum(w)) AS BIGINT) " +
          "AS rmi FROM (" +
          "SELECT event_type, b, " +
          "CAST(round(value * 100) AS BIGINT) AS cents, " +
          "CASE WHEN u < 0.36787944117144233 THEN 0 " +
          "WHEN u < 0.7357588823428847 THEN 1 " +
          "WHEN u < 0.9196986029286058 THEN 2 " +
          "WHEN u < 0.9810118431238462 THEN 3 " +
          "WHEN u < 0.9963401531726563 THEN 4 ELSE 5 END AS w " +
          "FROM (SELECT event_type, event_id, value, b, " +
          "CAST((event_id * (1103515245 + b * 2) + b * 1013904223 + 6789) " +
          "% 2147483647 AS DOUBLE) / 2147483647.0 AS u " +
          "FROM events, range(1, 51) t(b))) GROUP BY 1, 2) " +
          "SELECT event_type, CAST(count(*) AS BIGINT) AS n_boot, " +
          droundSql("avg(rmi) / 1e8", 4) + " AS boot_mean, " +
          droundSql("quantile_cont(rmi, 0.05) / 1e8", 4) + " AS ci_lo, " +
          droundSql("quantile_cont(rmi, 0.95) / 1e8", 4) + " AS ci_hi " +
          "FROM reps GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "events_seq_regex",
      (s, dir) => {
        val code = when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .when(col("event_type") === "signup", "s")
          .otherwise("e")
        T(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            code.as("c"))
          .groupBy("user_id")
          .agg(expr("array_join(transform(array_sort(" +
            "collect_list(struct(ts, event_id, c))), x -> x.c), '')")
            .as("j"))
          .select(
            count(lit(1)).as("n_users"),
            sum(when(col("j").rlike("v.*c.*p"), 1L).otherwise(0L))
              .as("n_funnel_vcp"),
            sum(when(col("j").rlike("s.*p"), 1L).otherwise(0L))
              .as("n_signup_conv"),
            sum(when(col("j").rlike("e.*e.*e"), 1L).otherwise(0L))
              .as("n_err3"),
            max(length(col("j")).cast("long")).as("max_len"))
      },
      Some(
        "WITH j AS (SELECT user_id, string_agg(" +
          "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' " +
          "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' " +
          "ELSE 'e' END, '' ORDER BY CAST(ts AS TIMESTAMP), event_id) " +
          "AS j FROM events GROUP BY user_id) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_users, " +
          "CAST(sum(CASE WHEN regexp_matches(j, 'v.*c.*p') THEN 1 " +
          "ELSE 0 END) AS BIGINT) AS n_funnel_vcp, " +
          "CAST(sum(CASE WHEN regexp_matches(j, 's.*p') THEN 1 " +
          "ELSE 0 END) AS BIGINT) AS n_signup_conv, " +
          "CAST(sum(CASE WHEN regexp_matches(j, 'e.*e.*e') THEN 1 " +
          "ELSE 0 END) AS BIGINT) AS n_err3, " +
          "CAST(max(length(j)) AS BIGINT) AS max_len FROM j")
    ),
    Q(
      "win_rolling_median",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(-6, 0)
        T(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
          .withColumn("med", expr("percentile(cents, 0.5)").over(w))
          .select(col("event_type"), col("d"),
            dround(col("cents") / 100, 2).as("revenue"),
            dround(col("med") / 100, 2).as("med7"))
          .orderBy("event_type", "d")
      },
      Some(
        "WITH d AS (SELECT event_type, " +
          "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, " +
          "sum(CAST(round(value * 100) AS BIGINT)) AS cents " +
          "FROM events GROUP BY 1, 2) " +
          "SELECT event_type, d, " +
          droundSql("cents / 100", 2) + " AS revenue, " +
          droundSql("med / 100", 2) + " AS med7 FROM (" +
          "SELECT event_type, d, cents, quantile_cont(cents, 0.5) " +
          "OVER (PARTITION BY event_type ORDER BY d " +
          "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med FROM d) " +
          "ORDER BY event_type, d")
    ),
    Q(
      "ts_kalman_1d",
      // q = 25, r = 2500 (cents²): gain settles to the golden-ratio-ish
      // steady state K* = (sqrt(q² + 4qr) − q) / 2r within ~10 steps.
      (s, dir) => {
        import s.implicits._
        T(s, dir, "events")
          .groupBy(col("event_type"),
            (unix_timestamp(date_trunc("hour", col("ts"))
              .cast("timestamp")) / 3600L).cast("long").as("hb"))
          .agg((sum(round(col("value") * 100).cast("long")).cast("double")
            / count(lit(1))).as("y"))
          .as[(String, Long, Double)]
          .groupByKey(_._1)
          .flatMapGroups { (et, it) =>
            val series = it.toSeq.sortBy(_._2)
            var s0 = series.head._3
            var p = 10000.0
            series.map { case (_, hb, y) =>
              val pPred = p + 25.0
              val k = pPred / (pPred + 2500.0)
              s0 = s0 + k * (y - s0)
              p = (1 - k) * pPred
              (et, hb, y, s0, k)
            }
          }
          .toDF("event_type", "hb", "yr", "sr", "kr")
          .select(col("event_type"),
            timestamp_seconds(col("hb") * 3600L).cast("timestamp_ntz")
              .as("h"),
            dround(col("yr") / 100, 4).as("y"),
            dround(col("sr") / 100, 4).as("filtered"),
            dround(col("kr"), 6).as("gain"))
          .orderBy("event_type", "h")
      },
      None
    )
  )
}
