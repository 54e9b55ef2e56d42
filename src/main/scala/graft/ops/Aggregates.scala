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
    ),
    Q(
      "agg_filtered",
      // FILTER-clause aggregates: one scan, several differently-filtered
      // aggregates — the idiomatic replacement for N self-joined subqueries
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_total"),
            expr("count(*) FILTER (WHERE o_orderstatus = 'O')").as("n_open"),
            (expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) " +
              "FILTER (WHERE o_orderstatus = 'F')") / 100.0)
              .as("filled_total"))
          .orderBy("o_orderpriority"),
      Some(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_total, " +
          "CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open, " +
          "sum(CAST(round(o_totalprice * 100) AS BIGINT)) " +
          "FILTER (WHERE o_orderstatus = 'F') / 100.0 AS filled_total " +
          "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority")
    ),
    Q(
      "agg_arg_max",
      // deterministic arg-max via struct ordering (max over (value, key)
      // breaks ties on the unique key — engine-portable, unlike max_by)
      (s, dir) =>
        T(s, dir, "customer")
          .groupBy("c_nationkey")
          .agg(max(struct(col("c_acctbal").as("bal"),
            col("c_custkey").as("key"))).as("m"))
          .select(col("c_nationkey"), col("m.key").as("top_cust"),
            col("m.bal").as("top_bal"))
          .orderBy("c_nationkey"),
      Some(
        "SELECT c_nationkey, " +
          "(max({'bal': c_acctbal, 'key': c_custkey})).key AS top_cust, " +
          "(max({'bal': c_acctbal, 'key': c_custkey})).bal AS top_bal " +
          "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey")
    ),
    Q(
      "agg_mode",
      // mode with a deterministic tie-break (max count, then max value) —
      // built-in mode() leaves ties engine-defined, struct-max does not
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("o_orderstatus")
          .agg(max(struct(col("cnt"), col("o_orderpriority").as("p")))
            .as("m"))
          .select(col("o_orderstatus"), col("m.p").as("mode_priority"),
            col("m.cnt").as("n"))
          .orderBy("o_orderstatus"),
      Some(
        "SELECT o_orderstatus, " +
          "(max({'cnt': cnt, 'p': o_orderpriority})).p AS mode_priority, " +
          "(max({'cnt': cnt, 'p': o_orderpriority})).cnt AS n FROM " +
          "(SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) " +
          "AS cnt FROM orders GROUP BY 1, 2) t " +
          "GROUP BY o_orderstatus ORDER BY o_orderstatus")
    ),
    Q(
      "agg_corr",
      // correlation/covariance computed from EXACT decimal power sums (the
      // built-in corr/covar over doubles is partial-agg-order-dependent):
      // inputs are 2-decimal money/quantity values, so DECIMAL(18,2) casts
      // are exact and every sum is associative integer arithmetic; only
      // the final closed-form division happens in double (identical IEEE
      // ops on identical inputs in both engines), then dround.
      (s, dir) => {
        val n = count(lit(1)).cast("double")
        val q = col("l_quantity").cast("decimal(18,2)")
        val y = col("l_extendedprice").cast("decimal(18,2)")
        T(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(q).as("sx"), sum(y).as("sy"),
            sum(q * q).as("sxx"), sum(y * y).as("syy"),
            sum(q * y).as("sxy"))
          .select(
            col("l_returnflag"), col("n"),
            dround(
              (col("n").cast("double") * col("sxy").cast("double")
                - col("sx").cast("double") * col("sy").cast("double")) /
                sqrt((col("n").cast("double") * col("sxx").cast("double")
                  - col("sx").cast("double") * col("sx").cast("double")) *
                  (col("n").cast("double") * col("syy").cast("double")
                    - col("sy").cast("double") * col("sy").cast("double"))),
              6).as("corr_qp"),
            dround(
              (col("sxy").cast("double")
                - col("sx").cast("double") * col("sy").cast("double")
                  / col("n").cast("double")) /
                (col("n").cast("double") - 1.0), 4).as("covar_qp"))
          .orderBy("l_returnflag")
      },
      Some(
        "WITH t AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
          "sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx, " +
          "sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy, " +
          "sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx, " +
          "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy, " +
          "sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy " +
          "FROM lineitem GROUP BY l_returnflag) " +
          "SELECT l_returnflag, n, " +
          droundSql("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
            "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
            "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
            "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
            "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - " +
            "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))", 6) + " AS corr_qp, " +
          droundSql("(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * " +
            "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / " +
            "(CAST(n AS DOUBLE) - 1.0)", 4) + " AS covar_qp " +
          "FROM t ORDER BY l_returnflag")
    ),
    Q(
      "agg_string_agg",
      // ordered string aggregation (LISTAGG/string_agg): nations per region
      (s, dir) =>
        T(s, dir, "nation")
          .join(T(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(
            concat_ws("|", array_sort(collect_list(col("n_name"))))
              .as("nations"),
            count(lit(1)).as("n"))
          .orderBy("r_name"),
      Some(
        "SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations, " +
          "CAST(count(*) AS BIGINT) AS n " +
          "FROM nation JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY r_name ORDER BY r_name")
    ),
    Q(
      "agg_bool",
      // boolean aggregates: every/any (bool_and/bool_or) + conditional count
      (s, dir) =>
        T(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("every(l_quantity > 0)").as("all_pos"),
            expr("any(l_discount > 0.09)").as("some_big_disc"),
            expr("count_if(l_tax = 0.0)").as("n_taxfree"))
          .orderBy("l_returnflag"),
      Some(
        "SELECT l_returnflag, bool_and(l_quantity > 0) AS all_pos, " +
          "bool_or(l_discount > 0.09) AS some_big_disc, " +
          "CAST(sum(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_taxfree FROM lineitem " +
          "GROUP BY l_returnflag ORDER BY l_returnflag")
    )
  )
}
