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
    )
  )
}
