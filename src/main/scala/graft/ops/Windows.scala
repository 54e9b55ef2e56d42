package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.5 window functions + §2.6 sorts/limits/set ops.
  *
  * Scale notes: every window here is partitioned (user_id / custkey /
  * nationkey) so the sort is per-partition after one hash exchange — no
  * global sort. `orderBy(...).limit(k)` compiles to TakeOrderedAndProject
  * (per-partition top-k + driver merge of k·partitions rows), which is the
  * scalable global top-k. Set ops are hash-based distinct/except — one
  * shuffle each on the full row.
  */
object Windows extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "win_rank_topn_per_group",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T(s, dir, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some(
        "SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM " +
          "(SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER " +
          "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
          "FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn")
    ),
    Q(
      "win_topk_native",
      // SAME result as win_rank_topn_per_group, computed by graft's native
      // TopKPerGroup plan (graft.plans) — bounded per-group heaps on both
      // sides of the exchange instead of a full per-partition sort; the
      // output has no rank column, so rows are re-ranked here only for the
      // deterministic output contract
      (s, dir) => {
        val top = graft.plans.TopK.perGroup(
          T(s, dir, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice"),
          Seq("o_custkey"),
          Seq("o_totalprice" -> false, "o_orderkey" -> true),
          3)
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        top.withColumn("rn", row_number().over(w).cast("long"))
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some(
        "SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM " +
          "(SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER " +
          "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
          "FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn")
    ),
    Q(
      "win_range_interval",
      // time-based RANGE frame: events per user in the trailing 30 minutes
      // of EVENT TIME (not row count) — the time-decay window primitive.
      // RANGE peers share a frame, so duplicate timestamps are handled
      // identically in both engines.
      (s, dir) => {
        T(s, dir, "events").createOrReplaceTempView("wri_events")
        s.sql(
          "SELECT event_id, user_id, CAST(count(*) OVER (" +
            "PARTITION BY user_id ORDER BY ts " +
            "RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW) " +
            "AS BIGINT) AS n30m FROM wri_events ORDER BY event_id")
      },
      Some(
        "SELECT event_id, user_id, CAST(count(*) OVER (" +
          "PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) " +
          "RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW) " +
          "AS BIGINT) AS n30m FROM events ORDER BY event_id")
    ),
    Q(
      "win_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // integer-scaled running sum: immune to the engines' differing
        // window-sum accumulation strategies (sequential vs segment tree)
        T(s, dir, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            (sum(round(col("o_totalprice") * 100).cast("long")).over(w)
              / 100.0).as("running_rev"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(
        "SELECT o_custkey, o_orderkey, " +
          "sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER " +
          "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_rev " +
          "FROM orders ORDER BY o_custkey, o_orderkey")
    ),
    Q(
      "win_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        T(s, dir, "events")
          .select(
            col("user_id"),
            col("event_id"),
            round(col("value") - lag("value", 1).over(w), 4).as("delta_prev"),
            round(lead("value", 1).over(w) - col("value"), 4)
              .as("delta_next"))
          .orderBy("event_id")
      },
      Some(
        "SELECT user_id, event_id, " +
          "round(value - lag(value, 1) OVER w, 4) AS delta_prev, " +
          "round(lead(value, 1) OVER w - value, 4) AS delta_next " +
          "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY " +
          "CAST(ts AS TIMESTAMP), event_id) ORDER BY event_id")
    ),
    Q(
      "win_moving_avg",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-3, Window.currentRow)
        // exact: integer-scaled frame sum / frame count
        T(s, dir, "events")
          .select(
            col("user_id"),
            col("event_id"),
            (sum(round(col("value") * 100).cast("long")).over(w) /
              (lit(100.0) * count(lit(1)).over(w))).as("mavg"))
          .orderBy("event_id")
      },
      Some(
        "SELECT user_id, event_id, " +
          "sum(CAST(round(value * 100) AS BIGINT)) OVER w / " +
          "(100.0 * count(*) OVER w) AS mavg " +
          "FROM events WINDOW w AS " +
          "(PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id " +
          "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) ORDER BY event_id")
    ),
    Q(
      "win_ntile_dense",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        T(s, dir, "customer")
          .select(
            col("c_custkey"),
            col("c_nationkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            dense_rank().over(w).cast("long").as("drank"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_nationkey, CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
          "CAST(dense_rank() OVER w AS BIGINT) AS drank FROM customer " +
          "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) " +
          "ORDER BY c_custkey")
    ),
    Q(
      "win_first_last",
      // value window functions over a deterministic full frame
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T(s, dir, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            first("o_orderkey").over(w).as("best_order"),
            last("o_orderkey").over(w).as("worst_order"),
            expr("nth_value(o_orderkey, 2)").over(w).as("second_order"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(
        "SELECT o_custkey, o_orderkey, first_value(o_orderkey) OVER w AS best_order, " +
          "last_value(o_orderkey) OVER w AS worst_order, " +
          "nth_value(o_orderkey, 2) OVER w AS second_order FROM orders " +
          "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
          "ORDER BY o_custkey, o_orderkey")
    ),
    Q(
      "win_pct_rank",
      // percent_rank / cume_dist — exact rationals, deterministic under
      // the total (acctbal, custkey) order
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal"), col("c_custkey"))
        T(s, dir, "customer")
          .select(
            col("c_custkey"),
            col("c_nationkey"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_nationkey, percent_rank() OVER w AS pct_rank, " +
          "cume_dist() OVER w AS cume FROM customer " +
          "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) " +
          "ORDER BY c_custkey")
    ),
    Q(
      "sort_multi_key",
      (s, dir) =>
        T(s, dir, "lineitem")
          .select("l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber")
          .orderBy(col("l_returnflag"), col("l_shipdate").desc,
            col("l_orderkey"), col("l_linenumber"))
          .limit(100),
      Some(
        "SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber FROM lineitem " +
          "ORDER BY l_returnflag, l_shipdate DESC, l_orderkey, l_linenumber " +
          "LIMIT 100")
    ),
    Q(
      "topk_global",
      (s, dir) =>
        T(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")
    ),
    Q(
      "set_union_all",
      (s, dir) => {
        val e = T(s, dir, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), lit("click").as("label"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            lit("purchase").as("label"))
        clicks.unionByName(purchases).orderBy("event_id")
      },
      Some(
        "SELECT event_id, user_id, 'click' AS label FROM events " +
          "WHERE event_type = 'click' UNION ALL " +
          "SELECT event_id, user_id, 'purchase' AS label FROM events " +
          "WHERE event_type = 'purchase' ORDER BY event_id")
    ),
    Q(
      "set_intersect",
      (s, dir) =>
        T(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
          .intersect(
            T(s, dir, "orders")
              .filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_custkey").as("c_custkey")))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' " +
          "INTERSECT SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
          "ORDER BY c_custkey")
    ),
    Q(
      "set_except",
      (s, dir) =>
        T(s, dir, "orders")
          .select(col("o_custkey"))
          .except(
            T(s, dir, "orders")
              .filter(col("o_orderstatus") === "F")
              .select(col("o_custkey")))
          .orderBy("o_custkey"),
      Some(
        "SELECT o_custkey FROM orders EXCEPT " +
          "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' " +
          "ORDER BY o_custkey")
    ),
    Q(
      "win_cume_nth",
      // cume_dist + nth_value over a total per-partition order; both
      // engines use the same default frame (RANGE UNBOUNDED PRECEDING →
      // CURRENT ROW), and the unique (acctbal, custkey) order makes
      // nth_value deterministic
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("c_nationkey")
          .orderBy(col("c_acctbal"), col("c_custkey"))
        T(s, dir, "customer")
          .select(
            col("c_custkey"), col("c_nationkey"),
            graft.Det.dround(cume_dist().over(w), 6).as("cd"),
            nth_value(col("c_custkey"), 2).over(w).as("second_cust"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_nationkey, " +
          graft.Det.droundSql("cume_dist() OVER w", 6) + " AS cd, " +
          "nth_value(c_custkey, 2) OVER w AS second_cust FROM customer " +
          "WINDOW w AS (PARTITION BY c_nationkey " +
          "ORDER BY c_acctbal, c_custkey) ORDER BY c_custkey")
    ),
    Q(
      "win_lag_ignore_nulls",
      // lag(... IGNORE NULLS): last non-click value seen before each event
      // per user — the gap-fill primitive for sparse series
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        T(s, dir, "events")
          .withColumn("v",
            when(col("event_type") === "click", lit(null)
              .cast("double")).otherwise(col("value")))
          .select(
            col("event_id"), col("user_id"),
            lag(col("v"), 1, null, ignoreNulls = true).over(w)
              .as("prev_nonclick"))
          .orderBy("event_id")
      },
      Some(
        "SELECT event_id, user_id, " +
          "lag(CASE WHEN event_type = 'click' THEN NULL ELSE value END " +
          "IGNORE NULLS) OVER (PARTITION BY user_id " +
          "ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_nonclick " +
          "FROM events ORDER BY event_id")
    )
  )
}
