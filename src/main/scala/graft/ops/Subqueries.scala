package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Pivot, subquery, and bucketed-range-join operators (§2 extensions).
  *
  * Scale notes: `agg_pivot` compiles to one hash aggregate with N
  * conditional partials — no extra shuffle over a plain groupBy. The
  * correlated scalar subquery is decorrelated by Catalyst
  * (RewriteCorrelatedScalarSubquery) into an aggregate + left outer join —
  * same plan a hand-written join would give. `join_range_bucketed` is the
  * 100 TB twin of `join_theta_range`: instead of a BroadcastNestedLoopJoin,
  * each side maps its range to integer buckets and the pair matching
  * becomes a shuffled EQUI-join on the bucket key plus a residual filter —
  * the standard way to make interval joins partitionable.
  */
object Subqueries extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "agg_pivot",
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("O", "F", "P"))
          .agg(dsum(col("o_totalprice"), 2))
          .withColumnRenamed("O", "st_o")
          .withColumnRenamed("F", "st_f")
          .withColumnRenamed("P", "st_p")
          .orderBy("o_orderpriority"),
      Some(
        "SELECT o_orderpriority, " +
          dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 2) +
          " AS st_o, " +
          dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 2) +
          " AS st_f, " +
          dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", 2) +
          " AS st_p " +
          "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority")
    ),
    Q(
      "sub_scalar_correlated",
      // correlated scalar subquery — Catalyst decorrelates to agg + join
      (s, dir) => {
        T(s, dir, "customer").createOrReplaceTempView("sq_customer")
        T(s, dir, "orders").createOrReplaceTempView("sq_orders")
        s.sql(
          "SELECT c_custkey, (SELECT max(o_totalprice) FROM sq_orders " +
            "WHERE o_custkey = c_custkey) AS max_price " +
            "FROM sq_customer ORDER BY c_custkey")
      },
      Some(
        "SELECT c_custkey, (SELECT max(o_totalprice) FROM orders " +
          "WHERE o_custkey = c_custkey) AS max_price " +
          "FROM customer ORDER BY c_custkey")
    ),
    Q(
      "sub_in",
      (s, dir) => {
        T(s, dir, "customer").createOrReplaceTempView("sq2_customer")
        T(s, dir, "orders").createOrReplaceTempView("sq2_orders")
        s.sql(
          "SELECT o_orderkey, o_totalprice FROM sq2_orders " +
            "WHERE o_custkey IN (SELECT c_custkey FROM sq2_customer " +
            "WHERE c_mktsegment = 'BUILDING') ORDER BY o_orderkey")
      },
      Some(
        "SELECT o_orderkey, o_totalprice FROM orders " +
          "WHERE o_custkey IN (SELECT c_custkey FROM customer " +
          "WHERE c_mktsegment = 'BUILDING') ORDER BY o_orderkey")
    ),
    Q(
      "join_range_bucketed",
      // Same semantics as join_theta_range, executed as a partitionable
      // bucketed equi-join: parts explode their [0.9p, 1.1p] interval into
      // integer price buckets, lineitems map to one bucket, join on bucket
      // + residual BETWEEN. The oracle states the plain range join — the
      // result sets are identical.
      (s, dir) => {
        val width = 50.0
        val p = T(s, dir, "part")
          .filter(col("p_size") === 25)
          .select(col("p_partkey"), col("p_retailprice"))
          .withColumn("bucket",
            explode(sequence(
              floor(col("p_retailprice") * 0.9 / width).cast("long"),
              floor(col("p_retailprice") * 1.1 / width).cast("long"))))
        val l = T(s, dir, "lineitem")
          .filter(col("l_quantity") >= 49)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
          .withColumn("bucket",
            floor(col("l_extendedprice") / width).cast("long"))
        l.join(p, Seq("bucket"))
          .filter(col("l_extendedprice").between(
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
      "sub_lateral",
      // correlated LATERAL subquery in FROM: per-nation aggregate computed
      // by a dependent subquery. Catalyst decorrelates this into a join —
      // the scalable plan — rather than re-executing per outer row.
      (s, dir) => {
        T(s, dir, "nation").createOrReplaceTempView("lat_nation")
        T(s, dir, "customer").createOrReplaceTempView("lat_customer")
        s.sql(
          "SELECT n_name, t.n_cust, t.max_bal FROM lat_nation, " +
            "LATERAL (SELECT CAST(count(*) AS BIGINT) AS n_cust, " +
            "max(c_acctbal) AS max_bal FROM lat_customer " +
            "WHERE c_nationkey = n_nationkey) t " +
            "ORDER BY n_name")
      },
      Some(
        "SELECT n_name, t.n_cust, t.max_bal FROM nation, " +
          "LATERAL (SELECT CAST(count(*) AS BIGINT) AS n_cust, " +
          "max(c_acctbal) AS max_bal FROM customer " +
          "WHERE c_nationkey = n_nationkey) t " +
          "ORDER BY n_name")
    )
  )
}
