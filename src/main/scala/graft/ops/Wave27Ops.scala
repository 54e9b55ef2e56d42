package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Round-7 wave 27: the Spark-4 SQL-defined-function surface and
  * interval-estimate statistics.
  *
  *  - `udf_sql_scalar` / `udf_sql_table` are SQL-DEFINED functions
  *    (Spark 4 `CREATE FUNCTION … RETURN expr` / `RETURNS TABLE …`):
  *    logic declared in SQL text, inlined by the analyzer into the
  *    calling query — so unlike JVM UDFs they stay inside codegen and
  *    Catalyst can push/prune through them; the 100 TB story is "UDF
  *    semantics at built-in-function cost". DuckDB's `CREATE MACRO` /
  *    table macro is the exact oracle analog, so the oracle DEFINES the
  *    same function rather than hand-inlining it.
  *  - `sql_lateral_alias` pins lateral column-alias resolution (a
  *    select item referring to an alias defined earlier in the same
  *    list) — pure analysis sugar both engines share.
  *  - `sql_identifier_clause` is the `IDENTIFIER(:name)` templating
  *    clause: table names as parameters WITHOUT SQL injection (the
  *    argument parses as an identifier, never as SQL text).
  *  - `stats_wilson_ci` is the Wilson score interval (z = 2) per group —
  *    the interval every A/B readout should quote instead of ±Wald.
  *    Exact integer (k, n) feed one shared closed form; the float tail
  *    is rounded by the Det policy on both sides.
  */
object Wave27Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "udf_sql_scalar",
      (s, dir) => {
        val v = s"ord_usq_${System.nanoTime()}"
        T(s, dir, "lineitem").createOrReplaceTempView(v)
        s.sql(
          "CREATE OR REPLACE TEMPORARY FUNCTION graft_net_price(" +
            "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE " +
            "RETURN p * (1 - d) * (1 + t)")
        s.sql(
          s"SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
            "sum(CAST(round(graft_net_price(" +
            "l_extendedprice, l_discount, l_tax) * 100) AS BIGINT)) / 100 " +
            s"AS net FROM $v GROUP BY l_returnflag ORDER BY l_returnflag")
      },
      Some(
        "CREATE OR REPLACE MACRO graft_net_price(p, d, t) AS p * (1 - d) * (1 + t); " +
          "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
          "sum(CAST(round(graft_net_price(" +
          "l_extendedprice, l_discount, l_tax) * 100) AS BIGINT)) / 100 " +
          "AS net FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    ),
    Q(
      "udf_sql_table",
      (s, dir) => {
        val v = s"ord_ust_${System.nanoTime()}"
        T(s, dir, "orders").createOrReplaceTempView(v)
        s.sql(
          "CREATE OR REPLACE TEMPORARY FUNCTION graft_order_buckets(" +
            "lo DOUBLE, hi DOUBLE, n INT) RETURNS TABLE(b INT, blo DOUBLE, " +
            "bhi DOUBLE) RETURN SELECT id AS b, lo + (hi - lo) * id / n, " +
            "lo + (hi - lo) * (id + 1) / n " +
            "FROM (SELECT explode(sequence(0, n - 1)) AS id)")
        s.sql(
          s"SELECT b, CAST(count(o_orderkey) AS BIGINT) AS n_orders " +
            s"FROM graft_order_buckets(0.0, 600000.0, 6) LEFT JOIN $v " +
            "ON o_totalprice >= blo AND o_totalprice < bhi " +
            "GROUP BY b ORDER BY b")
      },
      Some(
        "CREATE OR REPLACE MACRO graft_order_buckets(lo, hi, n) AS TABLE " +
          "SELECT CAST(id AS INTEGER) AS b, lo + (hi - lo) * id / n AS blo, " +
          "lo + (hi - lo) * (id + 1) / n AS bhi FROM range(0, n) AS t(id); " +
          "SELECT b, CAST(count(o_orderkey) AS BIGINT) AS n_orders " +
          "FROM graft_order_buckets(0.0, 600000.0, 6) LEFT JOIN orders " +
          "ON o_totalprice >= blo AND o_totalprice < bhi " +
          "GROUP BY b ORDER BY b")
    ),
    Q(
      "sql_lateral_alias",
      (s, dir) => {
        val v = s"ord_lca_${System.nanoTime()}"
        T(s, dir, "orders").createOrReplaceTempView(v)
        s.sql(
          "SELECT o_orderkey, " +
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents, " +
            "cents DIV 100000 AS bucket_1k, " +
            "bucket_1k * 2 AS bucket_2x " +
            s"FROM $v WHERE o_orderkey < 2000 ORDER BY o_orderkey")
      },
      Some(
        "SELECT o_orderkey, " +
          "CAST(round(o_totalprice * 100) AS BIGINT) AS cents, " +
          "cents // 100000 AS bucket_1k, " +
          "bucket_1k * 2 AS bucket_2x " +
          "FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey")
    ),
    Q(
      "sql_identifier_clause",
      (s, dir) => {
        val v = s"ord_idf_${System.nanoTime()}"
        T(s, dir, "nation").createOrReplaceTempView(v)
        s.sql(
          "SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n " +
            "FROM IDENTIFIER(:tbl) GROUP BY n_regionkey ORDER BY n_regionkey",
          Map("tbl" -> v))
      },
      Some(
        "SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n " +
          "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")
    ),
    Q(
      "stats_wilson_ci",
      // Wilson score interval, z = 2, for P(order is finished) per
      // priority class: exact integer (k, n), one shared closed form,
      // 6-dp round on both engines (identical expression text — the
      // float ops associate identically)
      (s, dir) => {
        val agg = T(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
              .as("k"))
        val p = col("k").cast("double") / col("n")
        val nn = col("n").cast("double")
        val denom = lit(1.0) + lit(4.0) / nn
        val center = (p + lit(2.0) / nn) / denom
        val half = lit(2.0) *
          sqrt(p * (lit(1.0) - p) / nn + lit(1.0) / (nn * nn)) / denom
        agg.select(col("prio"), col("n"), col("k"),
            (round(center * 1e6) / 1e6).as("wilson_mid"),
            (round((center - half) * 1e6) / 1e6).as("wilson_lo"),
            (round((center + half) * 1e6) / 1e6).as("wilson_hi"))
          .orderBy("prio")
      },
      Some(
        "WITH a AS (SELECT o_orderpriority AS prio, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS k FROM orders GROUP BY o_orderpriority), " +
          "f AS (SELECT prio, n, k, " +
          "CAST(k AS DOUBLE) / n AS p, CAST(n AS DOUBLE) AS nn FROM a), " +
          "g AS (SELECT prio, n, k, " +
          "(p + 2.0 / nn) / (1.0 + 4.0 / nn) AS center, " +
          "2.0 * sqrt(p * (1.0 - p) / nn + 1.0 / (nn * nn)) / " +
          "(1.0 + 4.0 / nn) AS half FROM f) " +
          "SELECT prio, n, k, " +
          "round(center * 1e6) / 1e6 AS wilson_mid, " +
          "round((center - half) * 1e6) / 1e6 AS wilson_lo, " +
          "round((center + half) * 1e6) / 1e6 AS wilson_hi " +
          "FROM g ORDER BY prio")
    )
  )
}
