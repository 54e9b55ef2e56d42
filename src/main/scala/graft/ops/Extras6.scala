package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Round-3 surface wave 6: multi-distinct aggregation, null-safe join
  * equality, and batch upsert/merge.
  *
  * Scale notes:
  *  - `agg_count_distinct_multi`: two different DISTINCT columns in one
  *    aggregate plan through Catalyst's Expand — the input is replicated
  *    once per distinct group (×3 here: two distincts + the plain
  *    count). Correct and single-pass, but at 100 TB the expansion is
  *    the cost to watch: prefer mergeable sketches (agg_hll_sketch) or
  *    split aggregations when the multiplier bites.
  *  - `join_null_safe`: `<=>` (IS NOT DISTINCT FROM) joins NULL keys to
  *    NULL keys — still hash-partitionable (null hashes like any other
  *    value under null-safe equality), so the plan stays a plain
  *    shuffled/broadcast hash join, NOT a nested loop.
  *  - `data_upsert_merge` is MERGE INTO without a table format: one
  *    full-outer hash join on the key classifies every row as
  *    keep/update/insert and coalesces the payload. At 100 TB both
  *    sides bucket by doc_id and the join is co-located; the action
  *    breakdown is the audit record a warehouse merge emits.
  */
object Extras6 extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "agg_count_distinct_multi",
      // two DISTINCT columns + a plain count in ONE aggregate (Expand).
      (s, dir) =>
        T(s, dir, "events")
          .groupBy("event_type")
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            countDistinct(date_trunc("day", col("ts")).cast("date"))
              .as("n_days"),
            count(lit(1)).as("n_events"))
          .orderBy("event_type"),
      Some(
        "SELECT event_type, " +
          "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, " +
          "CAST(count(DISTINCT CAST(date_trunc('day', " +
          "CAST(ts AS TIMESTAMP)) AS DATE)) AS BIGINT) AS n_days, " +
          "CAST(count(*) AS BIGINT) AS n_events " +
          "FROM events GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "agg_grouping_id",
      // ROLLUP + GROUPING() flags: the flags (not NULL-ness) identify
      // subtotal rows, which is what makes rollups safe on nullable
      // group columns. The flags join the sort key so subtotal levels
      // order deterministically.
      (s, dir) =>
        T(s, dir, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"))
          .select(col("o_orderstatus"), col("o_orderpriority"),
            col("g_status"), col("g_prio"), col("n"))
          .orderBy(col("g_status"), col("g_prio"),
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some(
        "SELECT o_orderstatus, o_orderpriority, " +
          "CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status, " +
          "CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio, " +
          "CAST(count(*) AS BIGINT) AS n " +
          "FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority) " +
          "ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, " +
          "o_orderpriority NULLS FIRST")
    ),
    Q(
      "join_null_safe",
      // <=> equality: the NULL group (errors mapped to NULL) joins
      // across the two halves; a plain = join would silently drop it.
      // Explicit NULLS FIRST because the engines' default null order
      // differs.
      (s, dir) => {
        val ev = T(s, dir, "events")
          .select(nullif(col("event_type"), lit("error")).as("k"),
            col("user_id"))
        val l = ev.filter(col("user_id") % 2 === 0)
          .groupBy("k").agg(count(lit(1)).as("n_even"))
        val r = ev.filter(col("user_id") % 2 === 1)
          .groupBy("k").agg(count(lit(1)).as("n_odd"))
        l.join(r, l("k") <=> r("k"))
          .select(l("k"), col("n_even"), col("n_odd"))
          .orderBy(l("k").asc_nulls_first)
      },
      Some(
        "WITH e AS (SELECT nullif(event_type, 'error') AS k, user_id " +
          "FROM events), " +
          "l AS (SELECT k, CAST(count(*) AS BIGINT) AS n_even FROM e " +
          "WHERE user_id % 2 = 0 GROUP BY k), " +
          "r AS (SELECT k, CAST(count(*) AS BIGINT) AS n_odd FROM e " +
          "WHERE user_id % 2 = 1 GROUP BY k) " +
          "SELECT l.k, n_even, n_odd FROM l JOIN r " +
          "ON l.k IS NOT DISTINCT FROM r.k ORDER BY l.k NULLS FIRST")
    ),
    Q(
      "sql_pipe_syntax",
      // Spark 4 SQL pipe syntax (|>): the linear FROM-first form of a
      // filter → aggregate → order pipeline. Same plan as the nested
      // form; the oracle is the classic formulation.
      (s, dir) => {
        T(s, dir, "lineitem").createOrReplaceTempView("pipe_lineitem")
        s.sql(
          "FROM pipe_lineitem " +
            "|> WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
            "|> AGGREGATE CAST(count(*) AS BIGINT) AS n, " +
            "sum(CAST(round(l_extendedprice * 1e2) AS BIGINT)) / 1e2 " +
            "AS revenue GROUP BY l_returnflag " +
            "|> ORDER BY l_returnflag")
      },
      Some(
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
          "sum(CAST(round(l_extendedprice * 1e2) AS BIGINT)) / 1e2 " +
          "AS revenue FROM lineitem " +
          "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
          "GROUP BY l_returnflag ORDER BY l_returnflag")
    ),
    Q(
      "fn_format",
      // printf-style formatting surface: zero-padded ids, fixed-decimal
      // prices (2-decimal doubles → %.3f appends a zero, no rounding-tie
      // exposure), dot-padding, data-dependent repeat.
      (s, dir) =>
        T(s, dir, "part")
          .select(col("p_partkey"),
            expr("format_string('%08d', CAST(p_partkey AS INT))")
              .as("id_pad"),
            expr("format_string('%.3f', p_retailprice)").as("price_fmt"),
            lpad(col("p_name"), 30, ".").as("name_pad"),
            expr("repeat('*', CAST(p_partkey % 5 AS INT))").as("stars"))
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, printf('%08d', p_partkey) AS id_pad, " +
          "printf('%.3f', p_retailprice) AS price_fmt, " +
          "lpad(p_name, 30, '.') AS name_pad, " +
          "repeat('*', CAST(p_partkey % 5 AS INT)) AS stars " +
          "FROM part ORDER BY p_partkey")
    ),
    Q(
      "fn_collate",
      // Spark 4 collations: UTF8_LCASE makes comparison, grouping, and
      // DISTINCT case-insensitive at the TYPE level. The oracle lowers
      // explicitly — the pre-collation workaround it replaces.
      (s, dir) =>
        T(s, dir, "part")
          .select(col("p_partkey"),
            expr("collate(p_name, 'UTF8_LCASE')").as("name_ci"))
          .withColumn("has_red",
            col("name_ci").contains(expr("collate('RED', 'UTF8_LCASE')")))
          .groupBy("has_red")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("name_ci")).as("n_distinct_ci"))
          .orderBy("has_red"),
      Some(
        "WITH p AS (SELECT p_partkey, lower(p_name) AS name_ci " +
          "FROM part) " +
          "SELECT contains(name_ci, 'red') AS has_red, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(count(DISTINCT name_ci) AS BIGINT) AS n_distinct_ci " +
          "FROM p GROUP BY 1 ORDER BY has_red")
    ),
    Q(
      "data_upsert_merge",
      // MERGE: updates batch = every 10th doc revised (+' v2') plus 50
      // brand-new ids; full-outer join on doc_id classifies rows and
      // coalesces payloads; output is the per-action audit.
      (s, dir) => {
        val base = T(s, dir, "documents").select(col("doc_id"), col("text"))
        val upd = base.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"))
          .unionByName(base.filter(col("doc_id") < 50)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        base.select(col("doc_id"), col("text").as("old_text"))
          .join(upd.select(col("doc_id"), col("text").as("new_text")),
            Seq("doc_id"), "full_outer")
          .select(
            when(col("new_text").isNull, "keep")
              .when(col("old_text").isNull, "insert")
              .otherwise("update").as("action"),
            coalesce(col("new_text"), col("old_text")).as("text"))
          .groupBy("action")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text")).cast("long")).as("n_chars"))
          .orderBy("action")
      },
      Some(
        "WITH base AS (SELECT doc_id, text FROM documents), " +
          "upd AS (SELECT doc_id, text || ' v2' AS text FROM base " +
          "WHERE doc_id % 10 = 0 " +
          "UNION ALL SELECT doc_id + 1000000, text FROM base " +
          "WHERE doc_id < 50), " +
          "m AS (SELECT CASE WHEN u.text IS NULL THEN 'keep' " +
          "WHEN b.text IS NULL THEN 'insert' ELSE 'update' END AS action, " +
          "coalesce(u.text, b.text) AS text " +
          "FROM base b FULL OUTER JOIN upd u ON b.doc_id = u.doc_id) " +
          "SELECT action, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(length(text)) AS BIGINT) AS n_chars " +
          "FROM m GROUP BY action ORDER BY action")
    ),
    Q(
      "obs_pipeline_metrics",
      // Single-pass pipeline OBSERVABILITY (org.apache.spark.sql
      // .Observation / CollectMetrics): data-quality counters ride the
      // SAME job that produces the business result — input rows, null
      // keys, discount-band rows and a deterministic revenue sum are
      // collected as accumulator-style metrics while the query computes
      // its per-flag aggregate. At 100 TB this is the difference between
      // monitoring for free and paying a second full scan for counters;
      // the metrics see PRE-filter rows, which no post-hoc query on the
      // result could recover. The op emits the observed metrics
      // themselves (one row per metric) and DuckDB recomputes each from
      // the raw table.
      (s, dir) => {
        import graft.Det.dsum
        val obs = new org.apache.spark.sql.Observation(
          s"pipe_${java.util.UUID.randomUUID().toString.take(8)}")
        val li = T(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
            col("l_extendedprice"), col("l_returnflag"))
          .observe(obs,
            count(lit(1)).as("n_in"),
            sum(when(col("l_discount") > 0.05, 1L).otherwise(0L))
              .as("n_disc"),
            dsum(col("l_extendedprice"), 2).as("sum_price"))
        // the business query the metrics ride on
        val out = li.filter(col("l_quantity") < 10)
          .groupBy("l_returnflag").agg(count(lit(1)).as("n_small"))
        val perFlag = out.collect() // one action: result + metrics
        val m = obs.get
        import s.implicits._
        (Seq(
          ("n_in", m("n_in").asInstanceOf[Long].toDouble),
          ("n_disc", m("n_disc").asInstanceOf[Long].toDouble),
          ("sum_price", m("sum_price").asInstanceOf[Double])) ++
          perFlag.map(r =>
            (s"n_small_${r.getString(0)}", r.getLong(1).toDouble)))
          .toDF("metric", "value")
          .withColumn("value", graft.Det.dround(col("value"), 2))
          .orderBy("metric")
      },
      Some(
        "SELECT * FROM (" +
          "SELECT 'n_in' AS metric, " +
          "round(count(*) * 1e2) / 1e2 AS value FROM lineitem " +
          "UNION ALL SELECT 'n_disc', round(sum(CASE WHEN " +
          "l_discount > 0.05 THEN 1 ELSE 0 END) * 1e2) / 1e2 " +
          "FROM lineitem " +
          "UNION ALL SELECT 'sum_price', round((" +
          "sum(CAST(round(l_extendedprice * 1e2) AS BIGINT)) / 1e2" +
          ") * 1e2) / 1e2 FROM lineitem " +
          "UNION ALL SELECT 'n_small_' || l_returnflag, " +
          "round(count(*) * 1e2) / 1e2 FROM lineitem " +
          "WHERE l_quantity < 10 GROUP BY l_returnflag" +
          ") ORDER BY metric")
    ),
    Q(
      "sql_scripting",
      // SQL SCRIPTING (Spark 4's ANSI compound statements): DECLARE'd
      // session variables set from scalar subqueries over the table, a
      // WHILE loop, and IF/ELSE control flow — procedural orchestration
      // running INSIDE the engine, where each embedded query still plans
      // through Catalyst (a 100 TB script body is N optimized jobs, not
      // a driver-side row loop). The script returns its final SELECT.
      (s, dir) => {
        val view = "ord_" +
          java.util.UUID.randomUUID().toString.replace("-", "").take(8)
        T(s, dir, "orders").createOrReplaceTempView(view)
        val prev = s.conf.getOption("spark.sql.scripting.enabled")
        s.conf.set("spark.sql.scripting.enabled", "true")
        try s.sql(
          s"""BEGIN
             |  DECLARE hi BIGINT DEFAULT 0;
             |  DECLARE lo BIGINT DEFAULT 0;
             |  DECLARE i INT DEFAULT 1;
             |  DECLARE ssq BIGINT DEFAULT 0;
             |  SET hi = (SELECT count(*) FROM $view
             |            WHERE o_totalprice > 200000);
             |  SET lo = (SELECT count(*) FROM $view
             |            WHERE o_totalprice <= 200000);
             |  WHILE i <= 10 DO
             |    SET ssq = ssq + i * i;
             |    SET i = i + 1;
             |  END WHILE;
             |  IF hi > lo THEN
             |    SELECT 'hi' AS side, hi AS n, ssq AS sum_sq;
             |  ELSE
             |    SELECT 'lo' AS side, lo AS n, ssq AS sum_sq;
             |  END IF;
             |END""".stripMargin)
        finally prev match {
          case Some(p) => s.conf.set("spark.sql.scripting.enabled", p)
          case None => s.conf.unset("spark.sql.scripting.enabled")
        }
      },
      Some(
        "WITH c AS (SELECT " +
          "CAST(count(*) FILTER (o_totalprice > 200000) AS BIGINT) AS hi, " +
          "CAST(count(*) FILTER (o_totalprice <= 200000) AS BIGINT) AS lo " +
          "FROM orders) " +
          "SELECT CASE WHEN hi > lo THEN 'hi' ELSE 'lo' END AS side, " +
          "CASE WHEN hi > lo THEN hi ELSE lo END AS n, " +
          "CAST(385 AS BIGINT) AS sum_sq FROM c")
    )
  )
}
