package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** SURVEY §2.1 scans/sources/sinks + §2.2 projection/filter.
  *
  * Scale notes: all scans are plain `spark.read.parquet` so Catalyst performs
  * column pruning and predicate pushdown into the Parquet reader (verified by
  * plan assertions in ScanSpec — `PushedFilters`/`ReadSchema`). At 100 TB the
  * same plans hold: pruning happens per row-group via footer stats, and the
  * scan parallelism follows `spark.sql.files.maxPartitionBytes`.
  *
  * Determinism: `(l_orderkey, l_linenumber)` is NOT unique in the fixtures
  * (verified at sf0.01), so lineitem-level queries ORDER BY every output
  * column — identical full rows are then interchangeable and the result is
  * a deterministic multiset.
  */
object Scans extends QueryModule {

  private val lineitemCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  def queries: Seq[Q] = Seq(
    Q(
      "scan_parquet",
      (s, dir) =>
        T(s, dir, "lineitem")
          .orderBy(lineitemCols.map(col): _*)
          .limit(100),
      Some(
        s"SELECT * FROM lineitem ORDER BY ${lineitemCols.mkString(", ")} LIMIT 100")
    ),
    Q(
      "scan_pruned",
      // Column-pruned + predicate-pushed scan: only 3 columns reach the
      // reader and the shipdate predicate is evaluated on row-group stats.
      (s, dir) =>
        T(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_shipdate")
          .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
          .orderBy("l_orderkey", "l_linenumber", "l_shipdate"),
      Some(
        "SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem " +
          "WHERE l_shipdate >= TIMESTAMP '1998-01-01' " +
          "ORDER BY l_orderkey, l_linenumber, l_shipdate")
    ),
    Q(
      "source_csv_timeseries",
      // flink-rc-style CSV time-series ingestion: round-trip the events
      // series through CSV with an explicit schema (schema-on-read), then a
      // per-day aggregate. Timestamps travel as epoch-micros (long) so the
      // round trip is exact.
      (s, dir) => {
        val tmp = graft.Tmp.dir("graft_csv_ts")
        T(s, dir, "events")
          .select(
            col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            col("value"))
          .write.mode("overwrite").option("header", "true").csv(tmp)
        val schema = "event_id LONG, ts_us LONG, value DOUBLE"
        s.read.schema(schema).option("header", "true").csv(tmp)
          .groupBy(date_trunc("day", timestamp_micros(col("ts_us")))
            .cast("date").as("day"))
          .agg(
            count(lit(1)).as("n"),
            dsum(col("value"), 2).as("sum_val"))
          .orderBy("day")
      },
      // Oracle-expressible despite the CSV hop: the round trip is lossless,
      // so the day-level aggregate equals the direct parquet aggregate.
      Some(
        "SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, " +
          "CAST(count(*) AS BIGINT) AS n, " + dsumSql("value", 2) +
          " AS sum_val FROM events GROUP BY 1 ORDER BY day")
    ),
    Q(
      "sink_parquet",
      // Sink correctness: materialize an aggregate to parquet, re-read it.
      (s, dir) => {
        val tmp = graft.Tmp.dir("graft_sink")
        T(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice"), 2).as("total"))
          .write.mode("overwrite").parquet(tmp)
        s.read.parquet(tmp).orderBy("o_orderstatus")
      },
      Some(
        "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders, " +
          dsumSql("o_totalprice", 2) + " AS total " +
          "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")
    ),
    Q(
      "source_rcseries",
      // Custom DataSource V2 (graft.sources): deterministic Mackey-Glass
      // generator, one partition per series key. No oracle (generator is
      // engine-internal); SeriesSourceSpec checks determinism + content.
      (s, dir) =>
        s.read.format("rcseries")
          .option("keys", 8).option("n", 500).load()
          .groupBy("key")
          .agg(
            count(lit(1)).as("n"),
            dround(avg("value"), 6).as("mean_val"),
            dround(max("value"), 6).as("max_val"))
          .orderBy("key"),
      None
    ),
    Q(
      "project_arith",
      (s, dir) =>
        T(s, dir, "lineitem")
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            dround(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
              .as("revenue"),
            dround(
              col("l_extendedprice") * (lit(1) - col("l_discount")) *
                (lit(1) + col("l_tax")), 4).as("charge"))
          .orderBy("l_orderkey", "l_linenumber", "revenue", "charge"),
      Some(
        "SELECT l_orderkey, l_linenumber, " +
          droundSql("l_extendedprice*(1-l_discount)", 4) + " AS revenue, " +
          droundSql("l_extendedprice*(1-l_discount)*(1+l_tax)", 4) +
          " AS charge FROM lineitem " +
          "ORDER BY l_orderkey, l_linenumber, revenue, charge")
    ),
    Q(
      "filter_compound",
      (s, dir) =>
        T(s, dir, "lineitem")
          .filter(
            (col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
              || col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
            "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
            "l_returnflag"),
      Some(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag " +
          "FROM lineitem WHERE (l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24) " +
          "OR l_returnflag = 'R' " +
          "ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag")
    ),
    Q(
      "filter_in_null",
      (s, dir) =>
        T(s, dir, "part")
          .filter(
            col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
              col("p_size").isNotNull &&
              !col("p_name").like("%green%"))
          .select("p_partkey", "p_name", "p_brand", "p_size")
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, p_name, p_brand, p_size FROM part " +
          "WHERE p_brand IN ('Brand#1','Brand#2','Brand#3') " +
          "AND p_size IS NOT NULL AND p_name NOT LIKE '%green%' " +
          "ORDER BY p_partkey")
    )
  )
}
