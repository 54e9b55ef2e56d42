package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 20: band analytics, SLO monitoring, cohort splits and
  * quota curation.
  *
  *  - `win_bollinger_bands`: trailing mean ± 2σ envelope with breakout
  *    flags, variance closed-form from exact integer window sums.
  *  - `events_error_budget`: hourly error-rate vs an SLO threshold —
  *    the burn signal, exact counts only.
  *  - `events_new_vs_returning`: daily purchase split by whether the
  *    purchaser is on their FIRST active day — two keyed aggregates,
  *    no window over raw events.
  *  - `data_source_quota`: per-source document cap in deterministic
  *    hash order — quota sampling that caps a dominant source without
  *    biasing within it.
  */
object Wave20Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "win_bollinger_bands",
      // trailing-20-day mean ± 2σ envelope on daily revenue; σ from
      // the n·Σx²−(Σx)² closed form over integer DOLLARS (identical
      // int64 window sums on both engines, double math only at the
      // end; dollars keep n·Σx² and (Σx)² inside int64 through sf1 — cents
      // would overflow (Σx)² beyond ~sf0.01). The frame ends at 1 PRECEDING, so a spike is judged
      // against the window BEFORE it — it can't absorb itself. The
      // window runs over the day-level aggregate (|days| rows), not
      // raw orders.
      (s, dir) => {
        val daily = T(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice")).cast("long"))
            .as("dollars"))
        val w = Window.orderBy("day").rowsBetween(-20, -1)
        val b = daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("s1", sum(col("dollars")).over(w))
          .withColumn("s2", sum(col("dollars") * col("dollars")).over(w))
          .filter(col("n") >= 20)
          .withColumn("mean", col("s1").cast("double") / col("n"))
          .withColumn("sd",
            sqrt((col("n") * col("s2") - col("s1") * col("s1"))
              .cast("double")) / col("n"))
        b.select(col("day"), col("dollars").as("revenue"),
            dround(col("mean"), 2).as("mid"),
            dround(col("mean") + lit(2) * col("sd"), 2).as("upper"),
            dround(col("mean") - lit(2) * col("sd"), 2).as("lower"),
            (col("dollars") > col("mean") + lit(2) * col("sd") ||
              col("dollars") < col("mean") - lit(2) * col("sd"))
              .as("breakout"))
          .orderBy("day")
      },
      Some(
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, " +
          "CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS dollars " +
          "FROM orders GROUP BY 1), " +
          "b AS (SELECT day, dollars, " +
          "count(*) OVER win AS n, " +
          "CAST(sum(dollars) OVER win AS BIGINT) AS s1, " +
          "CAST(sum(dollars * dollars) OVER win AS BIGINT) AS s2 " +
          "FROM daily WINDOW win AS (ORDER BY day " +
          "ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)), " +
          "c AS (SELECT day, dollars, n, " +
          "CAST(s1 AS DOUBLE) / n AS mean, " +
          "sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n AS sd " +
          "FROM b WHERE n >= 20) " +
          "SELECT day, dollars AS revenue, " +
          droundSql("mean", 2) + " AS mid, " +
          droundSql("mean + 2 * sd", 2) + " AS upper, " +
          droundSql("mean - 2 * sd", 2) + " AS lower, " +
          "(dollars > mean + 2 * sd OR dollars < mean - 2 * sd) " +
          "AS breakout FROM c ORDER BY day")
    ),
    Q(
      "events_error_budget",
      // SLO burn signal: hourly error share vs a 25% budget — exact
      // integer counts, one hash aggregate keyed by hour; the flag
      // compares identically-computed doubles on both engines.
      (s, dir) => {
        T(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts"))
            .cast("timestamp_ntz").as("hour"))
          .agg(count(lit(1)).as("total"),
            sum((col("event_type") === "error").cast("long"))
              .as("errors"))
          .withColumn("rate",
            dround(col("errors").cast("double") / col("total"), 6))
          .withColumn("burning",
            col("errors").cast("double") / col("total") > 0.25)
          .orderBy("hour")
      },
      Some(
        "SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, " +
          "CAST(count(*) AS BIGINT) AS total, " +
          "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS errors, " +
          droundSql("CAST(sum(CASE WHEN event_type = 'error' THEN 1 " +
            "ELSE 0 END) AS DOUBLE) / count(*)", 6) + " AS rate, " +
          "(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) " +
          "AS DOUBLE) / count(*) > 0.25) AS burning " +
          "FROM events GROUP BY 1 ORDER BY hour")
    ),
    Q(
      "events_new_vs_returning",
      // daily purchases split by purchaser tenure: NEW = the purchase
      // lands on the user's first active day. One keyed reduce to
      // first days, one broadcast-sized join back, one aggregate — no
      // window over raw events.
      (s, dir) => {
        val ev = T(s, dir, "events")
        val firstDay = ev.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("first_day"))
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .join(firstDay, Seq("user_id"))
          .groupBy("day")
          .agg(
            sum((col("day") === col("first_day")).cast("long"))
              .as("new_purchases"),
            sum((col("day") =!= col("first_day")).cast("long"))
              .as("returning_purchases"))
          .orderBy("day")
      },
      Some(
        "WITH f AS (SELECT user_id, " +
          "min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS first_day " +
          "FROM events GROUP BY user_id), " +
          "p AS (SELECT e.user_id, " +
          "CAST(CAST(e.ts AS TIMESTAMP) AS DATE) AS day, f.first_day " +
          "FROM events e JOIN f ON e.user_id = f.user_id " +
          "WHERE e.event_type = 'purchase') " +
          "SELECT day, " +
          "CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS new_purchases, " +
          "CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS returning_purchases " +
          "FROM p GROUP BY day ORDER BY day")
    ),
    Q(
      "data_source_quota",
      // quota sampling: cap every source at 50 documents, chosen in
      // DETERMINISTIC hash order (md5 of the id — uncorrelated with
      // position or content, so the cap doesn't bias within a source).
      // One partition-bounded window; the survivors report with their
      // quota rank. The curation move when one crawl source dominates.
      (s, dir) => {
        val w = Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        T(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 50)
          .orderBy("source", "rk")
      },
      Some(
        "WITH r AS (SELECT doc_id, source, " +
          "CAST(row_number() OVER (PARTITION BY source " +
          "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) " +
          "AS rk FROM documents) " +
          "SELECT doc_id, source, rk FROM r WHERE rk <= 50 " +
          "ORDER BY source, rk")
    )
  )
}
