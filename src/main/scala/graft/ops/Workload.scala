package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Composite analytical workload queries (TPC-H Q3/Q5/Q10 analogs over the
  * fixture schema) — the realistic multi-join shapes a user actually runs,
  * and the substance of the benchmark.
  *
  * Scale notes: all three are classic star/snowflake plans — selective
  * dimension filters reach the scans (pushdown), small dims broadcast,
  * the fact-fact joins (orders⋈lineitem) shuffle on the join key once,
  * aggregates are partial-before-exchange, and the top-k is
  * TakeOrderedAndProject. AQE re-plans skewed partitions at runtime.
  */
object Workload extends QueryModule {

  private def rev = col("l_extendedprice") * (lit(1) - col("l_discount"))

  def queries: Seq[Q] = Seq(
    Q(
      "q3_shipping_priority",
      // top-10 open orders of BUILDING customers by pending revenue
      (s, dir) =>
        T(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .join(T(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .join(T(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(dsum(rev, 4).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderdate"),
            col("l_orderkey"))
          .limit(10),
      Some(
        "SELECT l_orderkey, o_orderdate, o_orderpriority, " +
          dsumSql("l_extendedprice*(1-l_discount)", 4) + " AS revenue " +
          "FROM customer JOIN orders ON c_custkey = o_custkey " +
          "JOIN lineitem ON o_orderkey = l_orderkey " +
          "WHERE c_mktsegment = 'BUILDING' " +
          "AND o_orderdate < TIMESTAMP '1998-01-01' " +
          "AND l_shipdate > TIMESTAMP '1998-01-01' " +
          "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
          "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10")
    ),
    Q(
      "q5_local_supplier",
      // revenue by nation for EUROPE where supplier and customer share the
      // nation (the snowflake join with a cross-dimension equality)
      (s, dir) =>
        T(s, dir, "customer")
          .join(T(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .join(T(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .join(T(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(T(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(T(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .groupBy("n_name")
          .agg(dsum(rev, 4).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name")),
      Some(
        "SELECT n_name, " +
          dsumSql("l_extendedprice*(1-l_discount)", 4) + " AS revenue " +
          "FROM customer JOIN orders ON c_custkey = o_custkey " +
          "JOIN lineitem ON o_orderkey = l_orderkey " +
          "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
          "JOIN nation ON s_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "WHERE r_name = 'EUROPE' " +
          "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
          "AND o_orderdate < TIMESTAMP '1998-01-01' " +
          "GROUP BY n_name ORDER BY revenue DESC, n_name")
    ),
    Q(
      "q10_returned_items",
      // top-20 customers by revenue lost to returns in 1997
      (s, dir) =>
        T(s, dir, "customer")
          .join(T(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .join(T(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_returnflag") === "R")
          .join(broadcast(T(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(dsum(rev, 4).as("lost_revenue"))
          .orderBy(col("lost_revenue").desc, col("c_custkey"))
          .limit(20),
      Some(
        "SELECT c_custkey, c_name, n_name, " +
          dsumSql("l_extendedprice*(1-l_discount)", 4) + " AS lost_revenue " +
          "FROM customer JOIN orders ON c_custkey = o_custkey " +
          "JOIN lineitem ON o_orderkey = l_orderkey " +
          "JOIN nation ON c_nationkey = n_nationkey " +
          "WHERE l_returnflag = 'R' " +
          "AND o_orderdate >= TIMESTAMP '1997-01-01' " +
          "AND o_orderdate < TIMESTAMP '1998-01-01' " +
          "GROUP BY c_custkey, c_name, n_name " +
          "ORDER BY lost_revenue DESC, c_custkey LIMIT 20")
    ),
    Q(
      "q6_forecast_revenue",
      // TPC-H Q6 analog: single-scan selective filter + one global sum —
      // the pure pushdown/codegen benchmark (no join, no shuffle beyond
      // the final partial-agg merge)
      (s, dir) =>
        T(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
          .agg(dsum(col("l_extendedprice") * col("l_discount"), 4)
            .as("revenue"), count(lit(1)).as("n_lines"))
          .select(col("revenue"), col("n_lines")),
      Some(
        "SELECT " + dsumSql("l_extendedprice*l_discount", 4) +
          " AS revenue, CAST(count(*) AS BIGINT) AS n_lines FROM lineitem " +
          "WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
          "AND l_shipdate < TIMESTAMP '1998-01-01' " +
          "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24")
    ),
    Q(
      "q12_late_shipping",
      // Q12 analog on this schema: lines shipped >90 days after the order
      // date, bucketed by priority class — fact⋈fact join + conditional agg
      (s, dir) =>
        T(s, dir, "orders")
          .join(T(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") >
            date_add(col("o_orderdate").cast("date"), 90)
              .cast("timestamp"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("late_lines"),
            expr("count(*) FILTER (WHERE o_orderpriority IN " +
              "('1-URGENT', '2-HIGH'))").as("critical_late"),
            dsum(rev, 4).as("late_revenue"))
          .orderBy("o_orderpriority"),
      Some(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS late_lines, " +
          "CAST(count(*) FILTER (WHERE o_orderpriority IN " +
          "('1-URGENT', '2-HIGH')) AS BIGINT) AS critical_late, " +
          dsumSql("l_extendedprice*(1-l_discount)", 4) + " AS late_revenue " +
          "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
          "WHERE l_shipdate > CAST(o_orderdate AS DATE) + 90 " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    ),
    Q(
      "q14_promo_revenue",
      // Q14 analog: promo revenue share per month — broadcast dim join +
      // conditional aggregation + exact-ratio division
      (s, dir) =>
        T(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(T(s, dir, "part")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(date_trunc("month", col("l_shipdate")).cast("date")
            .as("mo"))
          .agg(
            (sum(when(col("p_type") === "PROMO",
              round(rev * 1e4).cast("long")).otherwise(0L)) / 1e4)
              .as("promo_rev"),
            dsum(rev, 4).as("total_rev"))
          .select(col("mo"), col("promo_rev"),
            dround(lit(100.0) * col("promo_rev") / col("total_rev"), 6)
              .as("promo_pct"))
          .orderBy("mo"),
      Some(
        "WITH t AS (SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS mo, " +
          "sum(CASE WHEN p_type = 'PROMO' THEN " +
          "CAST(round(l_extendedprice*(1-l_discount)*1e4) AS BIGINT) " +
          "ELSE 0 END) / 1e4 AS promo_rev, " +
          dsumSql("l_extendedprice*(1-l_discount)", 4) + " AS total_rev " +
          "FROM lineitem JOIN part ON l_partkey = p_partkey " +
          "WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
          "AND l_shipdate < TIMESTAMP '1998-01-01' GROUP BY 1) " +
          "SELECT mo, promo_rev, " +
          droundSql("100.0 * promo_rev / total_rev", 6) + " AS promo_pct " +
          "FROM t ORDER BY mo")
    ),
    Q(
      "q18_large_customers",
      // Q18 analog: customers whose single orders exceed a quantity
      // threshold — aggregate-then-semi-join-back (the HAVING-driven
      // fact self-reference), then enrich with customer
      (s, dir) => {
        val big = T(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(dsum(col("l_quantity"), 2).as("total_qty"))
          .filter(col("total_qty") > 150)
        T(s, dir, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice"), col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
          .limit(50)
      },
      Some(
        "WITH big AS (SELECT l_orderkey, " + dsumSql("l_quantity", 2) +
          " AS total_qty FROM lineitem GROUP BY l_orderkey " +
          "HAVING " + dsumSql("l_quantity", 2) + " > 150) " +
          "SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty " +
          "FROM orders JOIN big ON o_orderkey = l_orderkey " +
          "JOIN customer ON o_custkey = c_custkey " +
          "ORDER BY total_qty DESC, o_orderkey LIMIT 50")
    )
  )
}
