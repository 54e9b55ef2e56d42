package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 13: relational reshaping + everyday BI primitives that
  * were still missing from the surface.
  *
  *  - `reshape_unpivot`: wide → long melt (the inverse of the pivot op)
  *    via the native `unpivot` — one narrow shuffle-free projection per
  *    metric, not a union of scans.
  *  - `ts_day_over_day`: per-type daily counts with day-over-day delta
  *    via `lag` — one window pass after a hash aggregate.
  *  - `agg_histogram`: fixed-width `width_bucket` histogram — a single
  *    hash aggregate whatever the bin count.
  *  - `win_pct_of_total`: share-of-total without a self-join (window
  *    over the whole frame carries the denominator to every row).
  */
object Wave13Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "reshape_unpivot",
      // wide → long (melt): each metric column becomes (metric, value)
      // rows. The native unpivot is a PROJECTION (replicated rows, no
      // shuffle, no scan-per-metric union) — at 100 TB melting k
      // metrics costs one scan, not k.
      (s, dir) => {
        val o = T(s, dir, "orders")
          .filter(col("o_orderkey") <= 2000)
          .select(col("o_orderkey"),
            col("o_totalprice"),
            col("o_custkey").cast("double").as("custkey_d"))
        o.unpivot(
          Array(col("o_orderkey")),
          Array(col("o_totalprice"), col("custkey_d")),
          "metric", "value")
          .select(col("o_orderkey"), col("metric"),
            dround(col("value"), 2).as("value"))
          .orderBy("o_orderkey", "metric")
      },
      Some(
        "SELECT o_orderkey, 'o_totalprice' AS metric, " +
          "round(o_totalprice * 1e2) / 1e2 AS value FROM orders " +
          "WHERE o_orderkey <= 2000 " +
          "UNION ALL " +
          "SELECT o_orderkey, 'custkey_d', " +
          "round(CAST(o_custkey AS DOUBLE) * 1e2) / 1e2 FROM orders " +
          "WHERE o_orderkey <= 2000 " +
          "ORDER BY o_orderkey, metric")
    ),
    Q(
      "ts_day_over_day",
      // per-type daily volumes with day-over-day delta: hash aggregate
      // to days (partial map-side combine), then ONE lag window per
      // type — the partition key bounds the sort to a type's day count.
      (s, dir) => {
        val daily = T(s, dir, "events")
          .groupBy(col("event_type"),
            to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
        daily
          .withColumn("prev", lag(col("n"), 1).over(w))
          .withColumn("delta", col("n") - col("prev"))
          .select(col("event_type"), col("day"),
            col("n"), col("delta"))
          .orderBy("event_type", "day")
      },
      Some(
        "WITH daily AS (SELECT event_type, " +
          "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
          "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) " +
          "SELECT event_type, day, n, " +
          "n - lag(n) OVER (PARTITION BY event_type ORDER BY day) " +
          "AS delta FROM daily ORDER BY event_type, day")
    ),
    Q(
      "agg_histogram",
      // fixed-width histogram via width_bucket: one hash aggregate at
      // any bin count (vs a CASE ladder or k filtered passes); bins
      // with no rows are absent — the standard sparse histogram shape.
      (s, dir) => {
        T(s, dir, "orders")
          .groupBy(width_bucket(col("o_totalprice"),
            lit(0d), lit(600000d), lit(12)).as("bin"))
          .agg(count(lit(1)).as("n"),
            dsum(col("o_totalprice"), 2).as("total"))
          .orderBy("bin")
      },
      Some(
        // DuckDB has no width_bucket: the closed-form equivalent for
        // lo=0, hi=600000, 12 bins (width 50000; overflow bin 13)
        "SELECT least(CAST(floor(o_totalprice / 50000) + 1 AS BIGINT), " +
          "13) AS bin, CAST(count(*) AS BIGINT) AS n, " +
          "sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100 " +
          "AS total FROM orders GROUP BY 1 ORDER BY bin")
    ),
    Q(
      "win_pct_of_total",
      // share-of-total per group WITHOUT a self-join or a second scan:
      // the whole-frame window carries the denominator to every row.
      // Integer cents keep the share ratio engine-order-proof.
      (s, dir) => {
        val cents = sum(round(col("o_totalprice") * 100).cast("long"))
        val byStatus = T(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(cents.as("cents"))
        byStatus
          .withColumn("share",
            round(col("cents") * 1e6 /
              sum(col("cents")).over(Window.partitionBy()))
              .cast("long"))
          .select(col("o_orderstatus"),
            (col("cents") / 100).as("total"), col("share"))
          .orderBy("o_orderstatus")
      },
      Some(
        "WITH s AS (SELECT o_orderstatus, " +
          "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents " +
          "FROM orders GROUP BY 1) " +
          "SELECT o_orderstatus, cents / 100 AS total, " +
          "CAST(round(cents * 1e6 / sum(cents) OVER ()) AS BIGINT) " +
          "AS share FROM s ORDER BY o_orderstatus")
    )
  )
}
