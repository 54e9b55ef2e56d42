package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-technique operators: each demonstrates a 100 TB pattern while
  * remaining oracle-checkable (the oracle states the logical result; the
  * technique changes only the physical plan).
  *
  *  - `agg_salted`: two-stage salted aggregation — the standard fix for a
  *    skewed group key: partial-aggregate on (key, salt) first so no
  *    single reducer owns a hot key, then final-aggregate on key.
  *  - `win_range_frame`: RANGE frame over integer days (vs the ROWS
  *    frames elsewhere) — trailing-30-day revenue per customer.
  *  - `source_json` / `source_orc`: additional source formats
  *    round-tripped losslessly, so the day-level oracle still holds.
  *  - `sink_bucketed_join`: both join sides written bucketed on the join
  *    key, then joined — bucketing co-locates matching rows so the join
  *    plans WITHOUT a shuffle exchange (asserted in PlanSpec).
  */
object Extras extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "agg_salted",
      (s, dir) => {
        val salted = T(s, dir, "events")
          .withColumn("salt", pmod(col("event_id"), lit(16)))
          .groupBy("event_type", "salt")
          .agg(
            count(lit(1)).as("pn"),
            sum(round(col("value") * 100).cast("long")).as("psum"))
        salted
          .groupBy("event_type")
          .agg(
            sum("pn").as("n"),
            (sum("psum") / 100.0).as("sum_val"))
          .orderBy("event_type")
      },
      Some(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("value", 2) + " AS sum_val " +
          "FROM events GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "win_range_frame",
      // trailing-30-day revenue per customer: RANGE frame over day numbers
      (s, dir) => {
        val days = (unix_micros(col("o_orderdate").cast("timestamp"))
          / 86400000000L).cast("long")
        val w = Window.partitionBy("o_custkey").orderBy("day")
          .rangeBetween(-30, Window.currentRow)
        T(s, dir, "orders")
          .withColumn("day", days)
          .withColumn("rev30",
            sum(round(col("o_totalprice") * 100).cast("long")).over(w)
              / 100.0)
          // (o_custkey, day) is not unique → aggregate to make the output
          // key total: max rev30 per (custkey, day) — same value for all
          // rows of a day since RANGE frames see whole days
          .groupBy("o_custkey", "day")
          .agg(max("rev30").as("rev30"))
          .orderBy("o_custkey", "day")
      },
      Some(
        "WITH t AS (SELECT o_custkey, " +
          "CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) " +
          "AS BIGINT) AS day, o_totalprice FROM orders), " +
          "r AS (SELECT o_custkey, day, " +
          "sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER " +
          "(PARTITION BY o_custkey ORDER BY day " +
          "RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) / 100.0 AS rev30 FROM t) " +
          "SELECT o_custkey, day, max(rev30) AS rev30 FROM r " +
          "GROUP BY o_custkey, day ORDER BY o_custkey, day")
    ),
    Q(
      "source_json",
      // JSON-lines source round trip (schema-on-read with explicit schema)
      (s, dir) => {
        val tmp = graft.Tmp.dir("graft_json_src")
        T(s, dir, "events")
          .select(col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            col("event_type"), col("value"))
          .write.mode("overwrite").json(tmp)
        s.read
          .schema("event_id LONG, ts_us LONG, event_type STRING, value DOUBLE")
          .json(tmp)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            dsum(col("value"), 2).as("sum_val"),
            min("event_id").as("first_id"))
          .orderBy("event_type")
      },
      Some(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("value", 2) + " AS sum_val, min(event_id) AS first_id " +
          "FROM events GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "source_orc",
      // ORC source round trip
      (s, dir) => {
        val tmp = graft.Tmp.dir("graft_orc_src")
        T(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus", "l_quantity")
          .write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            dsum(col("l_quantity"), 2).as("qty"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(
        "SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("l_quantity", 2) + " AS qty FROM lineitem " +
          "GROUP BY l_returnflag, l_linestatus " +
          "ORDER BY l_returnflag, l_linestatus")
    ),
    Q(
      "agg_collect",
      // nested-result aggregation: per nation, the sorted set of market
      // segments present and its size. collect_set is order-free; sorting
      // makes the array deterministic. Serialized to a joined string because
      // the driver's pandas comparator cannot sort list-typed columns
      // (round-1 t2: lexsort_indexer failure on array cells).
      (s, dir) =>
        T(s, dir, "customer")
          .groupBy("c_nationkey")
          .agg(
            array_join(array_sort(collect_set(col("c_mktsegment"))), "|")
              .as("segments"),
            size(collect_set(col("c_mktsegment"))).cast("long")
              .as("n_segments"))
          .orderBy("c_nationkey"),
      Some(
        "SELECT c_nationkey, " +
          "array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|') " +
          "AS segments, CAST(len(list_distinct(list(c_mktsegment))) AS BIGINT) " +
          "AS n_segments FROM customer GROUP BY c_nationkey " +
          "ORDER BY c_nationkey")
    ),
    Q(
      "fn_null",
      // null-handling family over generated nulls: nullif / coalesce /
      // null-safe equality / null counting.
      (s, dir) =>
        T(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_discount"),
            expr("nullif(l_discount, 0.0)").as("disc_or_null"))
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            coalesce(col("disc_or_null"), lit(-1.0)).as("disc_coalesced"),
            col("disc_or_null").isNull.cast("long").as("is_free"),
            (col("disc_or_null") <=> lit(0.05)).cast("long").as("is_5pct"))
          .orderBy("l_orderkey", "l_linenumber", "l_quantity",
            "disc_coalesced"),
      Some(
        "SELECT l_orderkey, l_linenumber, l_quantity, " +
          "COALESCE(nullif(l_discount, 0.0), -1.0) AS disc_coalesced, " +
          "CAST(nullif(l_discount, 0.0) IS NULL AS BIGINT) AS is_free, " +
          "CAST(nullif(l_discount, 0.0) IS NOT DISTINCT FROM 0.05 AS BIGINT) " +
          "AS is_5pct FROM lineitem " +
          "ORDER BY l_orderkey, l_linenumber, l_quantity, disc_coalesced")
    ),
    Q(
      "sample_seeded",
      // seeded Bernoulli sampling — the training-pipeline subset op.
      // Engine-specific RNG ⇒ no oracle; the spec asserts determinism and
      // that the fraction lands near 10%.
      (s, dir) =>
        T(s, dir, "documents")
          .sample(withReplacement = false, fraction = 0.1, seed = 42L)
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id"),
      None
    ),
    Q(
      "sink_partitioned_prune",
      // Hive-style partitioned layout + partition pruning: write orders
      // partitioned by status, re-read with a status filter — the pruned
      // scan reads only the matching directory (PartitionFilters in the
      // plan, asserted in PlanSpec). At 100 TB this is the first-line
      // data-skipping mechanism for low-cardinality predicates.
      (s, dir) => {
        prunedScan(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            dsum(col("o_totalprice"), 2).as("total"))
          .orderBy("o_orderpriority")
      },
      Some(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("o_totalprice", 2) + " AS total " +
          "FROM orders WHERE o_orderstatus = 'O' " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    ),
    Q(
      "sink_bucketed_join",
      // Bucketed co-located join: both sides bucketBy(8, custkey) →
      // the sort-merge join reads bucket-aligned files, NO shuffle
      // exchange on either side (PlanSpec asserts it).
      (s, dir) => {
        val tmp = graft.Tmp.dir("graft_bucketed")
        T(s, dir, "orders")
          .select("o_custkey", "o_orderkey", "o_totalprice")
          .write.mode("overwrite")
          .option("path", s"$tmp/orders_b")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable(ordersTbl)
        T(s, dir, "customer")
          .select("c_custkey", "c_mktsegment")
          .write.mode("overwrite")
          .option("path", s"$tmp/customer_b")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable(custTbl)
        bucketedJoin(s)
      },
      Some(
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, " +
          dsumSql("o_totalprice", 2) + " AS total " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    ),
    Q(
      "agg_hll_sketch",
      // sketch-as-column: per-language HLL sketches of user-ish ids built
      // with Datasketches (hll_sketch_agg), merged across groups with
      // hll_union_agg, estimated once — the mergeable-summary pattern that
      // lets 100 TB distinct-counts run as constant-size partials.
      // lgConfigK pinned at 21: the sketch stays in sparse (coupon) mode —
      // i.e. EXACT — far past the fixture's distinct cardinality (verified
      // est == exact at sf0.01 and sf0.1), so the op is oracle-checked
      // against DuckDB's exact count; at real scale the same plan degrades
      // gracefully to ±0.4% estimates (the point of the pattern).
      (s, dir) =>
        T(s, dir, "documents")
          .groupBy("lang")
          .agg(expr("hll_sketch_agg(doc_id, 21)").as("sk"),
            countDistinct("doc_id").as("exact"))
          .groupBy(lit(1).as("one"))
          .agg(
            expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long")
              .as("est_total"),
            sum("exact").as("exact_total"))
          .select("est_total", "exact_total"),
      Some(
        "SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS est_total, " +
          "CAST(count(DISTINCT doc_id) AS BIGINT) AS exact_total " +
          "FROM documents")
    ),
    Q(
      "sink_compaction",
      // small-files compaction — the operational-hygiene pass every large
      // parquet dataset needs: a fragmented write (64 files) is rewritten
      // at a sane file count (4), byte-identical in content. The oracle
      // states the data is unchanged; SketchSpec asserts the 64→4 file
      // counts (mirroring this pipeline — keep the two in sync).
      (s, dir) => {
        val frag = graft.Tmp.dir("graft_frag")
        val compact = graft.Tmp.dir("graft_compact")
        T(s, dir, "events")
          .select("event_id", "event_type", "value")
          .repartition(64)
          .write.mode("overwrite").parquet(frag)
        s.read.parquet(frag)
          .repartition(4)
          .write.mode("overwrite").parquet(compact)
        s.read.parquet(compact)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            min("event_id").as("first_id"),
            dsum(col("value"), 2).as("sum_val"))
          .orderBy("event_type")
      },
      Some(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
          "min(event_id) AS first_id, " + dsumSql("value", 2) +
          " AS sum_val FROM events GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "source_schema_evolution",
      // schema evolution across parquet batches: an old batch lacks a
      // column, mergeSchema=true unions the footers and null-fills — the
      // long-lived-dataset pattern (columns get added over years of
      // batches; readers must not break)
      (s, dir) => {
        val tmp = graft.Tmp.dir("graft_evo")
        val o = T(s, dir, "orders")
        o.select("o_orderkey", "o_totalprice")
          .write.mode("overwrite").parquet(s"$tmp/v1")
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
          .write.mode("overwrite").parquet(s"$tmp/v2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$tmp/v1", s"$tmp/v2")
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("o_orderpriority")).as("n_with_priority"),
            dsum(col("o_totalprice"), 2).as("total"))
      },
      Some(
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
          "CAST(count(o_orderpriority) AS BIGINT) AS n_with_priority, " +
          dsumSql("o_totalprice", 2) + " AS total FROM " +
          "(SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority " +
          "FROM orders UNION ALL SELECT o_orderkey, o_totalprice, " +
          "o_orderpriority FROM orders) t")
    )
  )

  /** partitioned write + filtered re-read (split out for plan assertions) */
  def prunedScan(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val tmp = graft.Tmp.dir("graft_partitioned")
    T(s, dir, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(tmp)
    s.read.parquet(tmp).filter(col("o_orderstatus") === "O")
  }

  // per-JVM unique bucketed-table names: concurrent sessions sharing a
  // metastore must not clobber each other's table definitions
  private val runTag = java.lang.Long.toHexString(System.nanoTime())
  private val ordersTbl = s"graft_orders_b_$runTag"
  private val custTbl = s"graft_customer_b_$runTag"

  /** the join over the bucketed tables (split out for plan assertions) */
  def bucketedJoin(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    // disable auto-broadcast so the co-located SMJ (not BHJ) is exercised
    val orders = s.table(ordersTbl).hint("merge")
    val cust = s.table(custTbl).hint("merge")
    orders.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice"), 2).as("total"))
      .orderBy("c_mktsegment")
  }
}
