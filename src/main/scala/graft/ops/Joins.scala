package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — the full join matrix.
  *
  * Scale notes: dimension tables (region/nation/supplier) are explicitly
  * `broadcast()` where the star shape makes it correct at any scale; the big
  * fact-fact joins (orders⋈customer) are left to Catalyst, which picks
  * shuffled-hash/sort-merge keyed on the equi-columns — with AQE on, skewed
  * partitions re-split at runtime. The theta join pre-filters both sides to
  * slices so the unavoidable BroadcastNestedLoopJoin stays bounded; at 100 TB
  * you'd first range-bucket both sides and equi-join on the bucket.
  */
object Joins extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "join_inner_hash",
      (s, dir) =>
        T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"), "inner")
          .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, o_custkey, c_name, o_totalprice " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "ORDER BY o_orderkey")
    ),
    Q(
      "join_broadcast",
      // Star join: fact joined to explicitly-broadcast dims — no shuffle of
      // the fact table at all; the whole pipeline is map-side.
      (s, dir) =>
        T(s, dir, "lineitem")
          .join(broadcast(T(s, dir, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(T(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(T(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
              .as("revenue"))
          .orderBy("r_name", "n_name"),
      Some(
        "SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_items, " +
          dsumSql("l_extendedprice*(1-l_discount)", 4) + " AS revenue " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "JOIN nation ON s_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY r_name, n_name ORDER BY r_name, n_name")
    ),
    Q(
      "join_left_outer",
      (s, dir) =>
        T(s, dir, "customer")
          .join(T(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("order_cnt"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS order_cnt " +
          "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
          "GROUP BY c_custkey ORDER BY c_custkey")
    ),
    Q(
      "join_full_outer",
      // Aggregate both sides first (tiny results), then FULL OUTER JOIN —
      // keeps the FOJ bounded and deterministic at any scale.
      (s, dir) => {
        val sa = T(s, dir, "supplier")
          .groupBy("s_nationkey")
          .agg(
            count(lit(1)).as("supp_cnt"),
            dsum(col("s_acctbal"), 2).as("supp_bal"))
        val ca = T(s, dir, "customer")
          .groupBy("c_nationkey")
          .agg(
            count(lit(1)).as("cust_cnt"),
            dsum(col("c_acctbal"), 2).as("cust_bal"))
        sa.join(ca, col("s_nationkey") === col("c_nationkey"), "full_outer")
          .select(
            coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
            col("supp_cnt"), col("supp_bal"),
            col("cust_cnt"), col("cust_bal"))
          .orderBy("nationkey")
      },
      Some(
        "WITH sa AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS supp_cnt, " +
          dsumSql("s_acctbal", 2) + " AS supp_bal FROM supplier GROUP BY s_nationkey), " +
          "ca AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS cust_cnt, " +
          dsumSql("c_acctbal", 2) + " AS cust_bal FROM customer GROUP BY c_nationkey) " +
          "SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey, supp_cnt, supp_bal, " +
          "cust_cnt, cust_bal FROM sa FULL OUTER JOIN ca ON s_nationkey = c_nationkey " +
          "ORDER BY nationkey")
    ),
    Q(
      "join_semi",
      (s, dir) =>
        T(s, dir, "customer")
          .join(
            T(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
          "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND " +
          "o_orderpriority = '1-URGENT') ORDER BY c_custkey")
    ),
    Q(
      "join_anti",
      // customers with no URGENT order (every customer has SOME order at
      // t2 scale, so the unfiltered anti-join would be trivially empty)
      (s, dir) =>
        T(s, dir, "customer")
          .join(
            T(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
          "(SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
          "AND o_orderpriority = '1-URGENT') ORDER BY c_custkey")
    ),
    Q(
      "join_theta_range",
      // Pure range (theta) join on pre-filtered slices; physically a
      // BroadcastNestedLoopJoin with the small part slice broadcast.
      (s, dir) => {
        val p = T(s, dir, "part")
          .filter(col("p_size") === 25)
          .select("p_partkey", "p_retailprice")
        val l = T(s, dir, "lineitem")
          .filter(col("l_quantity") >= 49)
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
        l.join(broadcast(p),
            col("l_extendedprice").between(
              col("p_retailprice") * 0.9, col("p_retailprice") * 1.1))
          .select("p_partkey", "l_orderkey", "l_linenumber")
          .orderBy("p_partkey", "l_orderkey", "l_linenumber")
      },
      Some(
        "SELECT p_partkey, l_orderkey, l_linenumber " +
          "FROM (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
          "WHERE l_quantity >= 49) l JOIN (SELECT p_partkey, p_retailprice FROM part " +
          "WHERE p_size = 25) p ON l.l_extendedprice BETWEEN p.p_retailprice*0.9 " +
          "AND p.p_retailprice*1.1 " +
          "ORDER BY p_partkey, l_orderkey, l_linenumber")
    ),
    Q(
      "join_asof",
      // As-of join (the RC input/target-alignment analog): for each purchase
      // event, the latest click by the same user at or before it. Expressed
      // as a union-ordered window scan — one shuffle on user_id, no
      // nested-loop — the classic scalable as-of formulation.
      (s, dir) => {
        val w = Window
          .partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"))
          .withColumn("asof_click_ts",
            last(when(col("event_type") === "click", col("ts")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(
            col("user_id"),
            col("event_id"),
            date_trunc("second", col("ts")).cast("timestamp_ntz").as("p_ts"),
            date_trunc("second", col("asof_click_ts")).cast("timestamp_ntz")
              .as("click_ts"))
          .orderBy("user_id", "event_id")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type " +
          "FROM events WHERE event_type IN ('click','purchase')), " +
          "t AS (SELECT user_id, event_id, ts, event_type, " +
          "last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS) " +
          "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_ts FROM e) " +
          "SELECT user_id, event_id, date_trunc('second', ts) AS p_ts, " +
          "date_trunc('second', asof_click_ts) AS click_ts FROM t " +
          "WHERE event_type = 'purchase' ORDER BY user_id, event_id")
    )
  )
}
