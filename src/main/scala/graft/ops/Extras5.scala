package graft.ops

import graft.{Q, QueryModule, T, Tmp}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 surface wave 5: warehouse dimension maintenance (SCD2), exact
  * quantiles, running distinct counts, bitmap-based exact distinct, the
  * parameterized-SQL API, column masking, and a sort-layout sink.
  *
  * Scale notes, op by op:
  *  - `dim_scd2` runs BOTH window passes over the same user_id hash
  *    partitioning — Catalyst plans one exchange and reuses the sort for
  *    the change-filter and the interval assembly. This is the standard
  *    change-data-capture shape: at 100 TB the input is the merge of a
  *    base snapshot and a day of deltas, and the per-key window logic is
  *    unchanged.
  *  - `agg_percentiles` uses EXACT percentile, which buffers each group —
  *    right for dims and fixtures, wrong for a 100 TB fact table; the
  *    scale path is `approx_percentile` (t-digest-style mergeable sketch,
  *    already covered by `agg_approx_quantile`). Keeping both shows the
  *    exact/approximate trade deliberately.
  *  - `win_distinct_running` keeps a per-frame set (`collect_set` over a
  *    growing frame is maintained incrementally, not re-evaluated per
  *    row); memory is bounded by per-key distinct cardinality (5 event
  *    types here). At high cardinality flip to the first-occurrence-flag
  *    + running-sum formulation — which is exactly what the oracle SQL
  *    does, so this op also documents the rewrite.
  *  - `agg_bitmap_distinct` is EXACT distinct counting with constant-size
  *    mergeable partials (the roaring-bitmap pattern): bucket ids into
  *    32-wide blocks, OR the bit masks (associative + commutative — one
  *    partial agg, no distinct shuffle of raw ids), popcount and sum.
  *    At 100 TB this replaces `count(DISTINCT id)`'s full re-shuffle of
  *    every id with a shuffle of one long per (group, id/32) block.
  *  - `sink_sorted_stats` writes the fact range-partitioned + sorted by
  *    ship date, then reads a narrow date slice back. Sorting within
  *    files narrows parquet row-group min/max spans so selective scans
  *    skip most row groups — the zone-map layout every large warehouse
  *    maintains. Correctness is layout-independent (oracle runs on the
  *    original), which is the point: same answer, cheaper scan.
  */
object Extras5 extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "dim_scd2",
      // Type-2 slowly-changing dimension build from an event stream: one
      // versioned row per (user, state) run, with [valid_from, valid_to)
      // intervals and an is_current flag. Output timestamps truncated to
      // seconds per the repo ts-output convention.
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        T(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
          .select(col("user_id"), col("event_type").as("state"),
            row_number().over(w).cast("long").as("version"),
            date_trunc("second", col("ts")).cast("timestamp_ntz")
              .as("valid_from"),
            date_trunc("second", lead("ts", 1).over(w))
              .cast("timestamp_ntz").as("valid_to"),
            lead("ts", 1).over(w).isNull.as("is_current"))
          .orderBy("user_id", "version")
      },
      Some(
        "WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS " +
          "ts, event_id FROM events), " +
          "c AS (SELECT *, lag(event_type) OVER " +
          "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
          "FROM e), " +
          "f AS (SELECT user_id, event_type, ts, event_id FROM c " +
          "WHERE prev_type IS NULL OR prev_type <> event_type) " +
          "SELECT user_id, event_type AS state, " +
          "CAST(row_number() OVER w AS BIGINT) AS version, " +
          "date_trunc('second', ts) AS valid_from, " +
          "date_trunc('second', lead(ts) OVER w) AS valid_to, " +
          "(lead(ts) OVER w IS NULL) AS is_current " +
          "FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
          "ORDER BY user_id, version")
    ),
    Q(
      "agg_percentiles",
      // Exact linear-interpolated quartiles of order value per status.
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))")
            .as("p"))
          .select(col("o_orderstatus"),
            dround(col("p")(0), 4).as("p25"),
            dround(col("p")(1), 4).as("p50"),
            dround(col("p")(2), 4).as("p75"))
          .orderBy("o_orderstatus"),
      Some(
        "WITH q AS (SELECT o_orderstatus, " +
          "quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS p " +
          "FROM orders GROUP BY o_orderstatus) " +
          "SELECT o_orderstatus, " +
          droundSql("p[1]", 4) + " AS p25, " +
          droundSql("p[2]", 4) + " AS p50, " +
          droundSql("p[3]", 4) + " AS p75 " +
          "FROM q ORDER BY o_orderstatus")
    ),
    Q(
      "win_distinct_running",
      // Running count of DISTINCT event types seen per user. Neither
      // engine supports DISTINCT aggregates over a window directly; Spark
      // expresses it as the size of a growing collect_set frame, the
      // oracle as the equivalent first-occurrence-flag running sum.
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            size(collect_set("event_type").over(w)).cast("long")
              .as("n_types"))
          .orderBy("event_id")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, event_type, " +
          "CAST(ts AS TIMESTAMP) AS ts FROM events), " +
          "f AS (SELECT user_id, event_id, ts, CASE WHEN row_number() " +
          "OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) " +
          "= 1 THEN 1 ELSE 0 END AS first_seen FROM e) " +
          "SELECT user_id, event_id, CAST(sum(first_seen) OVER " +
          "(PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
          "AS n_types FROM f ORDER BY event_id")
    ),
    Q(
      "agg_bitmap_distinct",
      // Exact distinct users per event type WITHOUT shuffling raw ids:
      // ids bucketed into 32-wide blocks, bit_or-merged masks (one long
      // per non-empty block), popcount-summed. 32-bit blocks because
      // DuckDB raises on a 1<<63 shift; Spark would allow 64.
      (s, dir) =>
        T(s, dir, "events")
          .groupBy(col("event_type"),
            shiftright(col("user_id"), 5).as("bkt"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), " +
            "CAST(user_id % 32 AS INT)))").as("bits"))
          .groupBy("event_type")
          .agg(sum(bit_count(col("bits"))).cast("long").as("n_users"))
          .orderBy("event_type"),
      Some(
        "WITH b AS (SELECT event_type, user_id >> 5 AS bkt, " +
          "bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits " +
          "FROM events GROUP BY 1, 2) " +
          "SELECT event_type, CAST(sum(bit_count(bits)) AS BIGINT) " +
          "AS n_users FROM b GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "sql_params",
      // Parameterized SQL (Spark 4 named-parameter API): the injection-safe
      // programmatic surface. The oracle inlines the same literals.
      (s, dir) => {
        T(s, dir, "orders").createOrReplaceTempView("sqlp_orders")
        s.sql(
          "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, " +
            "sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / 1e2 " +
            "AS revenue " +
            "FROM sqlp_orders " +
            "WHERE o_totalprice >= :minp AND o_orderstatus = :st " +
            "GROUP BY o_orderpriority ORDER BY o_orderpriority",
          Map("minp" -> 150000, "st" -> "O"))
      },
      Some(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, " +
          "sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / 1e2 " +
          "AS revenue FROM orders " +
          "WHERE o_totalprice >= 150000 AND o_orderstatus = 'O' " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    ),
    Q(
      "fn_mask",
      // Column masking for PII-style redaction: Spark's mask() classifies
      // each ORIGINAL character (upper/lower/digit/other). The oracle
      // replays it as ordered regexp_replace passes — "other" first so
      // replacement characters can't be reclassified.
      (s, dir) =>
        T(s, dir, "customer")
          .select(col("c_custkey"),
            expr("mask(c_name)").as("m_default"),
            expr("mask(c_name, 'U', 'l', '#', '*')").as("m_custom"),
            expr("mask(c_mktsegment, 'X', 'x', 'n', NULL)").as("m_seg"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, " +
          "regexp_replace(regexp_replace(regexp_replace(c_name, " +
          "'[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') " +
          "AS m_default, " +
          "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
          "c_name, '[^A-Za-z0-9]', '*', 'g'), '[A-Z]', 'U', 'g'), " +
          "'[a-z]', 'l', 'g'), '[0-9]', '#', 'g') AS m_custom, " +
          "regexp_replace(regexp_replace(regexp_replace(c_mktsegment, " +
          "'[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') " +
          "AS m_seg " +
          "FROM customer ORDER BY c_custkey")
    ),
    Q(
      "vec_hof_dot_rewrite",
      // The PORTABLE dot-product formulation (aggregate ∘ zip_with), made
      // fast by the injected optimizer rule RewriteHofVecDot, which swaps
      // in the codegen'd FloatVecDot. Same query shape as vec_knn_query;
      // Extras5Spec asserts the optimized plan actually contains fvdot
      // and that results are identical to the explicit-fvdot twin.
      (s, dir) => {
        if (!s.experimental.extraOptimizations
            .contains(graft.plans.RewriteHofVecDot))
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ graft.plans.RewriteHofVecDot
        def hofDot(a: String, b: String) =
          s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * " +
            s"CAST(y AS DOUBLE)), 0D, (s, x) -> s + x)"
        val v = T(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            sqrt(expr(hofDot("embedding", "embedding"))).as("nrm"))
          .filter(col("nrm") > 0)
        val q = broadcast(v.filter(col("vec_id") === 0)
          .select(col("embedding").as("eq"), col("nrm").as("nq")))
        v.filter(col("vec_id") =!= 0)
          .crossJoin(q)
          .select(col("vec_id"),
            dround(expr(hofDot("embedding", "eq")) /
              (col("nrm") * col("nq")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(5)
      },
      Some(
        "WITH v0 AS (SELECT vec_id, embedding, sqrt((SELECT " +
          "sum(CAST(x.a AS DOUBLE)*x.a) FROM (SELECT unnest(embedding) " +
          "AS a) x)) AS nrm FROM embeddings), " +
          "v AS (SELECT * FROM v0 WHERE nrm > 0), " +
          "q AS (SELECT embedding AS eq, nrm AS nq FROM v WHERE vec_id = 0) " +
          "SELECT v.vec_id, " +
          droundSql("(SELECT sum(CAST(z.x AS DOUBLE)*z.y) FROM " +
            "(SELECT unnest(v.embedding) AS x, unnest(q.eq) AS y) z) " +
            "/ (v.nrm*q.nq)", 6) +
          " AS sim FROM v, q WHERE v.vec_id <> 0 " +
          "ORDER BY sim DESC, vec_id LIMIT 5")
    ),
    Q(
      "sink_sorted_stats",
      // Zone-map layout sink: range-partition + sort the fact by ship
      // date, write parquet, read a narrow date slice back. The sorted
      // layout narrows row-group min/max spans so the slice scan skips
      // most row groups; the answer is layout-independent (oracle reads
      // the original files).
      (s, dir) => {
        val out = Tmp.dir("graft_sorted")
        T(s, dir, "lineitem")
          .repartitionByRange(8, col("l_shipdate"))
          .sortWithinPartitions("l_shipdate")
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          .filter(col("l_shipdate").between("1996-01-01", "1996-03-31"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            dsum(col("l_extendedprice"), 2).as("rev"))
          .orderBy("l_returnflag")
      },
      Some(
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("l_extendedprice", 2) + " AS rev FROM lineitem " +
          "WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-03-31' " +
          "GROUP BY l_returnflag ORDER BY l_returnflag")
    )
  )
}
