package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 — aggregations.
  *
  * Scale notes: all groupBy aggregates here are algebraic (sum/count/avg/
  * stddev decompose into partials), so Spark plans a partial `HashAggregate`
  * before the exchange and a final one after — the shuffle carries one row
  * per (partition, group), not per input row. `count(DISTINCT)` expands to a
  * two-phase plan keyed on (group, distinct-value); at extreme cardinality
  * prefer `approx_count_distinct` (HLL, also here). Exact percentile/median
  * require a per-group sort — at 100 TB swap to `percentile_approx`.
  */
object Aggregates extends QueryModule {

  /** Flagship (TPC-H Q1 analog) — also `SparkEntry.entry`. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")), 6).as("sum_charge"),
        (dsum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount"), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  def queries: Seq[Q] = Seq(
    Q(
      "agg_pricing_summary",
      (s, dir) => pricingSummary(s, dir),
      Some(
        "SELECT l_returnflag, l_linestatus, " +
          dsumSql("l_quantity", 2) + " AS sum_qty, " +
          dsumSql("l_extendedprice", 2) + " AS sum_base_price, " +
          dsumSql("l_extendedprice*(1-l_discount)", 4) + " AS sum_disc_price, " +
          dsumSql("l_extendedprice*(1-l_discount)*(1+l_tax)", 6) + " AS sum_charge, " +
          "(" + dsumSql("l_quantity", 2) + ") / CAST(count(*) AS DOUBLE) AS avg_qty, " +
          "(" + dsumSql("l_extendedprice", 2) + ") / CAST(count(*) AS DOUBLE) AS avg_price, " +
          "(" + dsumSql("l_discount", 2) + ") / CAST(count(*) AS DOUBLE) AS avg_disc, " +
          "CAST(count(*) AS BIGINT) AS count_order " +
          "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
          "GROUP BY l_returnflag, l_linestatus " +
          "ORDER BY l_returnflag, l_linestatus")
    ),
    Q(
      "agg_distinct",
      (s, dir) =>
        T(s, dir, "events")
          .groupBy("event_type")
          .agg(
            countDistinct(col("user_id")).as("uniq_users"),
            count(lit(1)).as("n_events"))
          .orderBy("event_type"),
      Some(
        "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users, " +
          "CAST(count(*) AS BIGINT) AS n_events " +
          "FROM events GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "agg_approx_distinct",
      // HLL++ sketch — the 100 TB path for distinct counts (mergeable,
      // fixed-size state). Deterministic for fixed input but
      // algorithm-specific, so no DuckDB oracle; ScalaTest asserts the
      // estimate lands within rsd of the exact count.
      (s, dir) =>
        T(s, dir, "events")
          .groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
          .orderBy("event_type"),
      None
    ),
    Q(
      "agg_rollup",
      // SQL form: rollup grouping columns + NULLS FIRST sort resolve by
      // name (the DataFrame rollup→orderBy path trips plan-id ambiguity).
      (s, dir) => {
        T(s, dir, "customer").createOrReplaceTempView("ru_customer")
        T(s, dir, "nation").createOrReplaceTempView("ru_nation")
        T(s, dir, "region").createOrReplaceTempView("ru_region")
        s.sql(
          "SELECT r_name, n_name, count(1) AS n_cust, " +
            dsumSql("c_acctbal", 2) + " AS bal " +
            "FROM ru_customer JOIN ru_nation ON c_nationkey = n_nationkey " +
            "JOIN ru_region ON n_regionkey = r_regionkey " +
            "GROUP BY ROLLUP(r_name, n_name) " +
            "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST")
      },
      Some(
        "SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust, " +
          dsumSql("c_acctbal", 2) + " AS bal " +
          "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY ROLLUP(r_name, n_name) " +
          "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST")
    ),
    Q(
      "agg_cube",
      (s, dir) =>
        T(s, dir, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice"), 2).as("total"))
          .orderBy(asc_nulls_first("o_orderstatus"),
            asc_nulls_first("o_orderpriority")),
      Some(
        "SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders, " +
          dsumSql("o_totalprice", 2) + " AS total FROM orders " +
          "GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
          "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST")
    ),
    Q(
      "agg_grouping_sets",
      (s, dir) => {
        T(s, dir, "customer").createOrReplaceTempView("gs_customer")
        s.sql(
          "SELECT c_mktsegment, c_nationkey, count(1) AS n, " +
            dsumSql("c_acctbal", 2) + " AS bal FROM gs_customer " +
            "GROUP BY GROUPING SETS ((c_mktsegment),(c_nationkey),()) " +
            "ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST")
      },
      Some(
        "SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("c_acctbal", 2) + " AS bal FROM customer " +
          "GROUP BY GROUPING SETS ((c_mktsegment),(c_nationkey),()) " +
          "ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST")
    ),
    Q(
      "agg_having",
      (s, dir) =>
        T(s, dir, "customer")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("cust_cnt"))
          .filter(col("cust_cnt") > 60)
          .orderBy("c_nationkey"),
      Some(
        "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS cust_cnt FROM customer " +
          "GROUP BY c_nationkey HAVING count(*) > 60 ORDER BY c_nationkey")
    ),
    Q(
      "agg_stats",
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            // min/max/median are exact order statistics on identical
            // doubles — no rounding needed (or safe)
            min("o_totalprice").as("min_price"),
            max("o_totalprice").as("max_price"),
            dround(stddev_samp(col("o_totalprice")), 2).as("sd_price"),
            expr("median(o_totalprice)").as("med_price"),
            dround(expr("percentile(o_totalprice, 0.9D)"), 4)
              .as("p90_price"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_orderstatus"),
      Some(
        "SELECT o_orderstatus, min(o_totalprice) AS min_price, " +
          "max(o_totalprice) AS max_price, " +
          droundSql("stddev_samp(o_totalprice)", 2) + " AS sd_price, " +
          "median(o_totalprice) AS med_price, " +
          droundSql("quantile_cont(o_totalprice, 0.9)", 4) + " AS p90_price, " +
          "CAST(count(*) AS BIGINT) AS n_orders " +
          "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")
    )
  )
}
