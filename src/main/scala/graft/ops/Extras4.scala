package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 surface wave 4: per-group linear regression, the SQL
  * EXISTS/NOT EXISTS surface, bag-semantics set ops, binary encodings,
  * a dimension cross join, and gaps-and-islands streak analysis.
  *
  * Scale notes: `agg_regr` is one partial-aggregable pass (the regr_*
  * family reduces to six power sums — constant-size partials merge on
  * the exchange). `sub_exists` plans as one semi + one anti hash join
  * on c_custkey, both shuffle-free on the build side at dim scale and
  * partition-local when both sides are bucketed by custkey. The
  * EXCEPT/INTERSECT ALL pair hash-partitions both inputs by the row
  * value — one shuffle each side, no sort. `events_streaks` computes
  * both row_numbers over the SAME user_id hash partitioning — one
  * exchange, two partition-local sorts.
  */
object Extras4 extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "agg_regr",
      // OLS of extendedprice on quantity per return flag via the built-in
      // regr_* aggregate family (slope/intercept/r2 from merged power
      // sums). Same dround policy as agg_stats: identical rounding of the
      // built-in double aggregates on both engines.
      (s, dir) =>
        T(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("regr_count(l_extendedprice, l_quantity)").cast("long")
              .as("n"),
            dround(expr("regr_slope(l_extendedprice, l_quantity)"), 4)
              .as("slope"),
            dround(expr("regr_intercept(l_extendedprice, l_quantity)"), 4)
              .as("intercept"),
            dround(expr("regr_r2(l_extendedprice, l_quantity)"), 6)
              .as("r2"))
          .orderBy("l_returnflag"),
      Some(
        "SELECT l_returnflag, " +
          "CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n, " +
          droundSql("regr_slope(l_extendedprice, l_quantity)", 4) +
          " AS slope, " +
          droundSql("regr_intercept(l_extendedprice, l_quantity)", 4) +
          " AS intercept, " +
          droundSql("regr_r2(l_extendedprice, l_quantity)", 6) + " AS r2 " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    ),
    Q(
      "sub_exists",
      // Correlated EXISTS + NOT EXISTS through the SQL surface itself
      // (q21's Spark side decorrelates by hand into joins; here Catalyst
      // does the rewrite): customers with at least one urgent order and
      // no partially-filled order, counted per nation.
      (s, dir) => {
        T(s, dir, "customer").createOrReplaceTempView("sub_ex_customer")
        T(s, dir, "orders").createOrReplaceTempView("sub_ex_orders")
        s.sql(
          "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust " +
            "FROM sub_ex_customer c " +
            "WHERE EXISTS (SELECT 1 FROM sub_ex_orders o " +
            "WHERE o.o_custkey = c.c_custkey " +
            "AND o.o_orderpriority = '1-URGENT') " +
            "AND NOT EXISTS (SELECT 1 FROM sub_ex_orders o2 " +
            "WHERE o2.o_custkey = c.c_custkey " +
            "AND o2.o_orderstatus = 'P') " +
            "GROUP BY c_nationkey ORDER BY c_nationkey")
      },
      Some(
        "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust " +
          "FROM customer c " +
          "WHERE EXISTS (SELECT 1 FROM orders o " +
          "WHERE o.o_custkey = c.c_custkey " +
          "AND o.o_orderpriority = '1-URGENT') " +
          "AND NOT EXISTS (SELECT 1 FROM orders o2 " +
          "WHERE o2.o_custkey = c.c_custkey " +
          "AND o2.o_orderstatus = 'P') " +
          "GROUP BY c_nationkey ORDER BY c_nationkey")
    ),
    Q(
      "set_except_all",
      // EXCEPT ALL — bag difference, the multiset semantics DISTINCT-based
      // set_except can't express (a part shipped 3x as 'A' and 1x as 'R'
      // survives twice). Result is a bag, so it's re-aggregated to
      // (key, multiplicity) for a total output order.
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        li.filter(col("l_returnflag") === "A").select("l_partkey")
          .exceptAll(
            li.filter(col("l_returnflag") === "R").select("l_partkey"))
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("n_excess"))
          .orderBy("l_partkey")
      },
      Some(
        "SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_excess FROM (" +
          "(SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A') " +
          "EXCEPT ALL " +
          "(SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')) " +
          "GROUP BY l_partkey ORDER BY l_partkey")
    ),
    Q(
      "set_intersect_all",
      // INTERSECT ALL — bag intersection: min of the two multiplicities
      // per key, which the DISTINCT form collapses to 0/1.
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        li.filter(col("l_returnflag") === "A").select("l_partkey")
          .intersectAll(
            li.filter(col("l_returnflag") === "R").select("l_partkey"))
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("n_common"))
          .orderBy("l_partkey")
      },
      Some(
        "SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_common FROM (" +
          "(SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A') " +
          "INTERSECT ALL " +
          "(SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')) " +
          "GROUP BY l_partkey ORDER BY l_partkey")
    ),
    Q(
      "fn_encode",
      // Binary encodings over UTF-8 text bytes: hex, base64, popcount.
      // hex case differs across engines, so both sides lower() it.
      (s, dir) =>
        T(s, dir, "documents")
          .select(
            col("doc_id"),
            lower(hex(col("source").cast("binary"))).as("src_hex"),
            base64(col("source").cast("binary")).as("src_b64"),
            bit_count(col("doc_id")).cast("long").as("id_bits"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, lower(hex(source)) AS src_hex, " +
          "base64(encode(source)) AS src_b64, " +
          "CAST(bit_count(doc_id) AS BIGINT) AS id_bits " +
          "FROM documents ORDER BY doc_id")
    ),
    Q(
      "join_cross_small",
      // Explicit cartesian of two tiny dimensions — the feature-cross /
      // calendar-scaffold shape. Plans as BroadcastNestedLoopJoin; a cross
      // join is only ever safe when one side is broadcast-small, which is
      // exactly how it's used here (5 x 25 rows).
      (s, dir) =>
        T(s, dir, "region").select(col("r_regionkey"), col("r_name"))
          .crossJoin(
            T(s, dir, "nation").select(col("n_nationkey"), col("n_name")))
          .withColumn("in_region",
            (col("n_nationkey") % 5 === col("r_regionkey")).cast("boolean"))
          .orderBy("r_regionkey", "n_nationkey"),
      Some(
        "SELECT r_regionkey, r_name, n_nationkey, n_name, " +
          "(n_nationkey % 5 = r_regionkey) AS in_region " +
          "FROM region CROSS JOIN nation " +
          "ORDER BY r_regionkey, n_nationkey")
    ),
    Q(
      "events_streaks",
      // Gaps-and-islands: longest run of consecutive same-type events per
      // (user, type). The two row_numbers share the user_id partitioning —
      // one exchange, two partition-local sorts; the rn difference is
      // constant within a run, so the run id is pure integer arithmetic
      // (deterministic on both engines; event_id breaks ts ties).
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wt = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        T(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("grp",
            row_number().over(w) - row_number().over(wt))
          .groupBy("user_id", "event_type", "grp")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id", "event_type")
          .agg(max(col("len")).cast("long").as("max_streak"))
          .orderBy("user_id", "event_type")
      },
      Some(
        "WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS " +
          "ts, event_id FROM events), " +
          "g AS (SELECT user_id, event_type, " +
          "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)" +
          " - row_number() OVER (PARTITION BY user_id, event_type " +
          "ORDER BY ts, event_id) AS grp FROM e), " +
          "r AS (SELECT user_id, event_type, grp, count(*) AS len " +
          "FROM g GROUP BY 1, 2, 3) " +
          "SELECT user_id, event_type, CAST(max(len) AS BIGINT) AS " +
          "max_streak FROM r GROUP BY user_id, event_type " +
          "ORDER BY user_id, event_type")
    )
  )
}
