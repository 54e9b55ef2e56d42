package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators, wave 2: OHLC resampling, cohort
  * retention, and last-touch attribution — canonical "events table →
  * product dashboard" shapes not covered by the funnel/anomaly/session
  * family.
  *
  * Scale notes: all partition by user (or cohort) × time — the shuffle
  * key matches the natural partitioning of an event stream, and window
  * and aggregate reuse that one exchange. No fact-fact joins:
  * `events_attribution` is the asof-join-with-tolerance computed as a
  * single window pass over the interleaved stream instead of a
  * purchase×click range join (which would re-shuffle both slices and
  * build quadratic candidate pairs per user).
  */
object EventOps2 extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "ts_resample_ohlc",
      // downsample each user's value series to hourly OHLC bars: open =
      // first value in the bar by (ts, event_id), close = last, plus
      // high/low/count. row_number picks open/close — the formulation
      // that is portable to the oracle (DuckDB arg_min can't take a
      // composite ordering key).
      (s, dir) => {
        val ev = T(s, dir, "events")
          // date_trunc promotes NTZ input back to LTZ — pin NTZ so the
          // written parquet matches DuckDB's zoneless timestamps
          .withColumn("bar",
            date_trunc("hour", col("ts")).cast("timestamp_ntz"))
        val wAsc = Window.partitionBy("user_id", "bar")
          .orderBy(col("ts"), col("event_id"))
        val wDesc = Window.partitionBy("user_id", "bar")
          .orderBy(col("ts").desc, col("event_id").desc)
        ev.withColumn("rn_a", row_number().over(wAsc))
          .withColumn("rn_d", row_number().over(wDesc))
          .groupBy("user_id", "bar")
          .agg(
            max(when(col("rn_a") === 1, col("value"))).as("bar_open"),
            max(when(col("rn_d") === 1, col("value"))).as("bar_close"),
            max(col("value")).as("bar_high"),
            min(col("value")).as("bar_low"),
            count(lit(1)).cast("long").as("n_events"))
          .orderBy("user_id", "bar")
      },
      Some(
        "WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, " +
          "value, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar " +
          "FROM events), " +
          "r AS (SELECT *, " +
          "row_number() OVER (PARTITION BY user_id, bar " +
          "ORDER BY ts, event_id) AS rn_a, " +
          "row_number() OVER (PARTITION BY user_id, bar " +
          "ORDER BY ts DESC, event_id DESC) AS rn_d FROM e) " +
          "SELECT user_id, bar, " +
          "max(CASE WHEN rn_a = 1 THEN value END) AS bar_open, " +
          "max(CASE WHEN rn_d = 1 THEN value END) AS bar_close, " +
          "max(value) AS bar_high, min(value) AS bar_low, " +
          "CAST(count(*) AS BIGINT) AS n_events " +
          "FROM r GROUP BY user_id, bar ORDER BY user_id, bar")
    ),
    Q(
      "events_retention",
      // daily cohort retention: users grouped by their first active day,
      // matrix cell (cohort_day, day_offset) = how many of the cohort
      // were active that many days later. The min-over-window computes
      // each user's cohort without a second scan.
      (s, dir) => {
        val days = T(s, dir, "events")
          .select(col("user_id"),
            date_trunc("day", col("ts")).cast("date").as("day"))
          .distinct()
        val wu = Window.partitionBy("user_id")
        days
          .withColumn("cohort_day", min(col("day")).over(wu))
          .groupBy(col("cohort_day"),
            datediff(col("day"), col("cohort_day")).cast("long")
              .as("day_offset"))
          .agg(countDistinct(col("user_id")).cast("long").as("n_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some(
        "WITH d AS (SELECT DISTINCT user_id, " +
          "CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day " +
          "FROM events), " +
          "c AS (SELECT user_id, day, min(day) OVER " +
          "(PARTITION BY user_id) AS cohort_day FROM d) " +
          "SELECT cohort_day, CAST(day - cohort_day AS BIGINT) AS day_offset, " +
          "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users " +
          "FROM c GROUP BY 1, 2 ORDER BY cohort_day, day_offset")
    ),
    Q(
      "ts_cross_corr",
      // Lagged-zero cross-correlation between each user's hourly click
      // and view value series, from EXACT decimal power sums (the
      // agg_corr pattern — associative integer arithmetic, immune to
      // partial-agg order; only the final closed form runs in double).
      // Zero-variance series emit NULL explicitly on both engines.
      (s, dir) => {
        // ONE scan + one (user, hour) shuffle: the click/view series
        // pivot out as conditional sums (null when the type is absent
        // that hour), and the both-present filter replaces what would
        // otherwise be a self-join of two filtered aggregates over two
        // scans of the fact.
        val joined = T(s, dir, "events")
          .filter(col("event_type").isin("click", "view"))
          .groupBy(col("user_id"),
            date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hr"))
          .agg(
            sum(when(col("event_type") === "click",
              col("value").cast("decimal(18,2)"))).as("cv"),
            sum(when(col("event_type") === "view",
              col("value").cast("decimal(18,2)"))).as("vv"))
          .filter(col("cv").isNotNull && col("vv").isNotNull)
        joined.groupBy("user_id")
          .agg(count(lit(1)).as("n_hours"),
            sum(col("cv")).as("sx"), sum(col("vv")).as("sy"),
            sum(col("cv") * col("cv")).as("sxx"),
            sum(col("vv") * col("vv")).as("syy"),
            sum(col("cv") * col("vv")).as("sxy"))
          .select(col("user_id"), col("n_hours"),
            when(
              (col("n_hours").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
                (col("n_hours").cast("double") * col("syy").cast("double") -
                  col("sy").cast("double") * col("sy").cast("double")) > 0,
              dround(
                (col("n_hours").cast("double") * col("sxy").cast("double")
                  - col("sx").cast("double") * col("sy").cast("double")) /
                  sqrt((col("n_hours").cast("double") *
                    col("sxx").cast("double")
                    - col("sx").cast("double") * col("sx").cast("double")) *
                    (col("n_hours").cast("double") *
                      col("syy").cast("double")
                      - col("sy").cast("double") *
                        col("sy").cast("double"))), 4)).as("xcorr"))
          .orderBy("user_id")
      },
      Some(
        "WITH h AS (SELECT user_id, date_trunc('hour', " +
          "CAST(ts AS TIMESTAMP)) AS hr, " +
          "sum(CASE WHEN event_type = 'click' THEN " +
          "CAST(value AS DECIMAL(18,2)) END) AS cv, " +
          "sum(CASE WHEN event_type = 'view' THEN " +
          "CAST(value AS DECIMAL(18,2)) END) AS vv FROM events " +
          "WHERE event_type IN ('click', 'view') GROUP BY 1, 2), " +
          "j AS (SELECT user_id, cv, vv FROM h " +
          "WHERE cv IS NOT NULL AND vv IS NOT NULL), " +
          "p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_hours, " +
          "sum(cv) AS sx, sum(vv) AS sy, sum(cv*cv) AS sxx, " +
          "sum(vv*vv) AS syy, sum(cv*vv) AS sxy FROM j GROUP BY user_id) " +
          "SELECT user_id, n_hours, " +
          "CASE WHEN (CAST(n_hours AS DOUBLE)*CAST(sxx AS DOUBLE) - " +
          "CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * " +
          "(CAST(n_hours AS DOUBLE)*CAST(syy AS DOUBLE) - " +
          "CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) > 0 THEN " +
          droundSql(
            "(CAST(n_hours AS DOUBLE)*CAST(sxy AS DOUBLE) - " +
              "CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / " +
              "sqrt((CAST(n_hours AS DOUBLE)*CAST(sxx AS DOUBLE) - " +
              "CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * " +
              "(CAST(n_hours AS DOUBLE)*CAST(syy AS DOUBLE) - " +
              "CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))", 4) +
          " END AS xcorr FROM p ORDER BY user_id")
    ),
    Q(
      "ts_outlier_mad",
      // Robust outlier detection: median absolute deviation per event
      // type, outliers = |x - med| > 3·MAD. Unlike the z-score op
      // (events_anomaly), MAD is insensitive to the outliers themselves.
      // Spark side: TWO window passes over the SAME event_type hash
      // partitioning (exact percentile as a whole-partition window
      // aggregate) — one exchange, no self-joins; the oracle reaches the
      // identical numbers through CTE joins. Exact percentile buffers per
      // partition — at 100 TB switch the windows to approx_percentile.
      (s, dir) => {
        val w = Window.partitionBy("event_type")
        T(s, dir, "events")
          .select(col("event_type"), col("value"))
          .withColumn("med", expr("percentile(value, 0.5)").over(w))
          .withColumn("mad",
            expr("percentile(abs(value - med), 0.5)").over(w))
          .groupBy("event_type")
          .agg(
            dround(first(col("med")), 4).as("med"),
            dround(first(col("mad")), 4).as("mad"),
            count(lit(1)).as("n"),
            // the outlier compare runs on the 1e-6 integer grid: med
            // and mad are interpolated percentiles the two engines can
            // compute 1 ulp apart (the stats_lift_table class)
            sum(when(round(abs(col("value") - col("med")) * 1e6)
                .cast("long") >
              round(col("mad") * 3 * 1e6).cast("long"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some(
        "WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med " +
          "FROM events GROUP BY 1), " +
          "d AS (SELECT e.event_type, e.value, m.med FROM events e " +
          "JOIN m USING (event_type)), " +
          "md AS (SELECT event_type, quantile_cont(abs(value - med), 0.5) " +
          "AS mad FROM d GROUP BY 1), " +
          "f AS (SELECT d.event_type, d.value, d.med, md.mad FROM d " +
          "JOIN md USING (event_type)) " +
          "SELECT event_type, " +
          droundSql("any_value(med)", 4) + " AS med, " +
          droundSql("any_value(mad)", 4) + " AS mad, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(count(*) FILTER (WHERE " +
          "CAST(round(abs(value - med) * 1e6) AS BIGINT) > " +
          "CAST(round(mad * 3 * 1e6) AS BIGINT)) " +
          "AS BIGINT) AS n_outliers " +
          "FROM f GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "events_attribution",
      // Last-touch attribution: each purchase attributes to the user's
      // most recent click within the preceding 30 minutes (else null) —
      // the asof-join-with-tolerance, done as ONE window pass over the
      // interleaved per-user stream: last(click_id ignoring nulls) up to
      // the current row, then the tolerance null-out. Interval
      // comparison is exact µs arithmetic on both engines.
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts"))
          .withColumn("click_id",
            last(when(col("event_type") === "click", col("event_id")),
              ignoreNulls = true).over(w))
          .withColumn("click_ts",
            last(when(col("event_type") === "click", col("ts")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            when(col("click_ts") >= col("ts") - expr("INTERVAL 30 MINUTES"),
              col("click_id")).as("attributed_click"))
          .orderBy("event_id")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, event_type, " +
          "CAST(ts AS TIMESTAMP) AS ts FROM events), " +
          "lc AS (SELECT *, " +
          "last_value(CASE WHEN event_type = 'click' THEN event_id END " +
          "IGNORE NULLS) OVER w AS click_id, " +
          "last_value(CASE WHEN event_type = 'click' THEN ts END " +
          "IGNORE NULLS) OVER w AS click_ts " +
          "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
          "SELECT event_id, user_id, " +
          "CASE WHEN click_ts >= ts - INTERVAL 30 MINUTE THEN click_id " +
          "END AS attributed_click " +
          "FROM lc WHERE event_type = 'purchase' ORDER BY event_id")
    )
  )
}
