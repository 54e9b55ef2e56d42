package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 12: the remaining corpus/series diagnostics.
  *
  *  - `ts_acf_lags`: the autocorrelation function at lags 1..7 of each
  *    event type's daily count series — seven leads in ONE window pass,
  *    stacked to (type, lag) rows, then Pearson r per aligned pair set
  *    from BIGINT moment sums (the exact-decimal-power-sums discipline of
  *    agg_corr / ts_autocorr extended to a lag table). The periodicity
  *    diagnostic behind seasonality decisions.
  *  - `text_zipf_slope`: the Zipf exponent of the token frequency
  *    distribution — OLS slope of ln(freq) on ln(rank). The global
  *    frequency rank is the fourth use of the sharded prefix pattern;
  *    each (ln rank, ln freq) term is 1e3-quantized and integer-summed
  *    so the regression sums are engine-order-proof and n·Σx² stays in
  *    int64 at any realistic vocabulary.
  */
object Wave12Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "text_zipf_slope",
      // Zipf exponent of the en token-frequency distribution: OLS slope
      // of ln(freq) on ln(rank). Global frequency rank via the sharded
      // prefix pattern (4th use); each regression term is 1e3-quantized
      // then integer-summed so the OLS sums are engine-order-proof AND
      // n·Σx² stays within int64 at any realistic vocabulary. A
      // natural-corpus slope sits near -1; a synthetic-uniform corpus
      // flattens toward 0 — either way it's the shape gate.
      (s, dir) => {
        val freq = T(s, dir, "documents")
          .filter(col("lang") === "en")
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("f"))
        val mm = freq.agg(min("f"), max("f")).collect()(0)
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val width = math.max((hi - lo) / 32 + 1, 1L)
        val sharded = freq.withColumn("shard",
          least(((lit(hi) - col("f")) / width).cast("long"), lit(31L)))
        val local = Window.partitionBy("shard")
          .orderBy(col("f").desc, col("tok"))
        val prefixes = sharded.groupBy("shard")
          .agg(count(lit(1)).as("sn"))
        val wPrev = Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)
        val prev = prefixes
          .withColumn("pn", coalesce(sum("sn").over(wPrev), lit(0L)))
          .select("shard", "pn")
        val terms = sharded
          .withColumn("lrk", row_number().over(local).cast("long"))
          .join(broadcast(prev), "shard")
          .select(
            round(log((col("lrk") + col("pn")).cast("double")) * 1e3)
              .cast("long").as("lx"),
            round(log(col("f").cast("double")) * 1e3)
              .cast("long").as("ly"))
        terms.agg(count(lit(1)).as("n"),
            sum("lx").as("sx"), sum("ly").as("sy"),
            sum(col("lx") * col("lx")).as("sxx"),
            sum(col("lx") * col("ly")).as("sxy"))
          .select(col("n"),
            (round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double") * 1e6) / 1e6).as("zipf_slope"))
      },
      Some(
        "WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok " +
          "FROM documents WHERE lang = 'en'), " +
          "freq AS (SELECT tok, count(*) AS f FROM tk GROUP BY tok), " +
          "r AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) " +
          "AS rk FROM freq), " +
          "terms AS (SELECT " +
          "CAST(round(ln(CAST(rk AS DOUBLE)) * 1e3) AS BIGINT) AS lx, " +
          "CAST(round(ln(CAST(f AS DOUBLE)) * 1e3) AS BIGINT) AS ly " +
          "FROM r), " +
          "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy, " +
          "CAST(sum(lx * lx) AS BIGINT) AS sxx, " +
          "CAST(sum(lx * ly) AS BIGINT) AS sxy FROM terms) " +
          "SELECT n, round((n * sxy - sx * sy) / " +
          "CAST(n * sxx - sx * sx AS DOUBLE) * 1e6) / 1e6 " +
          "AS zipf_slope FROM m")
    ),
    Q(
      "events_interpurchase",
      // inter-purchase time distribution: per-user consecutive purchase
      // gaps (one lag per user timeline — exact µs, the join_asof
      // discipline), bucketed into hour-scale bins with an overflow
      // bucket. The retention-modeling input every LTV analysis starts
      // from; counts are exact integers end to end.
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        T(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("prev", lag("ts", 1).over(w))
          .filter(col("prev").isNotNull)
          .select((unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev").cast("timestamp"))).as("gap_us"))
          .select(least(floor(col("gap_us") / (3600L * 1000000L)),
            lit(48L)).cast("long").as("gap_hours"))
          .groupBy("gap_hours")
          .agg(count(lit(1)).as("n"))
          .orderBy("gap_hours")
      },
      Some(
        "WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, " +
          "event_id FROM events WHERE event_type = 'purchase'), " +
          "g AS (SELECT epoch_us(t) - epoch_us(lag(t, 1) OVER " +
          "(PARTITION BY user_id ORDER BY t, event_id)) AS gap_us " +
          "FROM p), " +
          "b AS (SELECT least(CAST(floor(gap_us / 3600000000) " +
          "AS BIGINT), 48) AS gap_hours FROM g " +
          "WHERE gap_us IS NOT NULL) " +
          "SELECT gap_hours, CAST(count(*) AS BIGINT) AS n " +
          "FROM b GROUP BY gap_hours ORDER BY gap_hours")
    ),
    Q(
      "join_fulfillment_latency",
      // order→ship fulfillment latency: the fact-fact join on orderkey,
      // lag in whole days, exact interpolated p50/p90 per priority (the
      // agg_percentiles convention: Spark percentile ↔ DuckDB
      // quantile_cont, dround-pinned). The operational-SLA readout every
      // fulfillment pipeline watches.
      (s, dir) => {
        val o = T(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_orderdate"))
        val l = T(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderpriority"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
              .as("lag_days"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            graft.Det.dround(
              expr("percentile(lag_days, 0.5)"), 4).as("p50"),
            graft.Det.dround(
              expr("percentile(lag_days, 0.9)"), 4).as("p90"),
            max("lag_days").as("max_days"))
          .orderBy("o_orderpriority")
      },
      Some(
        "WITH j AS (SELECT o_orderpriority, " +
          "CAST(datediff('day', CAST(o_orderdate AS DATE), " +
          "CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_days " +
          "FROM orders JOIN lineitem ON o_orderkey = l_orderkey) " +
          "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, " +
          graft.Det.droundSql("quantile_cont(lag_days, 0.5)", 4) +
          " AS p50, " +
          graft.Det.droundSql("quantile_cont(lag_days, 0.9)", 4) +
          " AS p90, " +
          "max(lag_days) AS max_days " +
          "FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority")
    ),
    Q(
      "ts_acf_lags",
      (s, dir) => {
        val daily = T(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("d")
        val withLeads = (1 to 7).foldLeft(daily) { (df, l) =>
          df.withColumn(s"c$l", lead("c", l).over(w))
        }
        val stacked = withLeads.select(col("event_type"), col("c"),
          expr("stack(7, " + (1 to 7).map(l =>
            s"${l}L, c$l").mkString(", ") + ") AS (lag, y)"))
          .filter(col("y").isNotNull)
        stacked.groupBy("event_type", "lag")
          .agg(count(lit(1)).as("n"),
            sum("c").as("sx"), sum("y").as("sy"),
            sum(col("c") * col("c")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("c") * col("y")).as("sxy"))
          .select(col("event_type"), col("lag"), col("n"),
            (round((col("n") * col("sxy") - col("sx") * col("sy")) /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")) * 1e6) / 1e6).as("acf"))
          .orderBy("event_type", "lag")
      },
      Some(
        "WITH daily AS (SELECT event_type, " +
          "date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, " +
          "count(*) AS c FROM events GROUP BY 1, 2), " +
          "leads AS (SELECT event_type, c, " +
          (1 to 7).map(l =>
            s"lead(c, $l) OVER (PARTITION BY event_type ORDER BY d) " +
              s"AS c$l").mkString(", ") + " FROM daily), " +
          "st AS (" +
          (1 to 7).map(l =>
            s"SELECT event_type, CAST($l AS BIGINT) AS lag, c, " +
              s"c$l AS y FROM leads WHERE c$l IS NOT NULL")
            .mkString(" UNION ALL ") + "), " +
          "m AS (SELECT event_type, lag, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(c) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
          "CAST(sum(c * c) AS BIGINT) AS sxx, " +
          "CAST(sum(y * y) AS BIGINT) AS syy, " +
          "CAST(sum(c * y) AS BIGINT) AS sxy " +
          "FROM st GROUP BY 1, 2) " +
          "SELECT event_type, lag, n, " +
          "round((n * sxy - sx * sy) / " +
          "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * " +
          "CAST(n * syy - sy * sy AS DOUBLE)) * 1e6) / 1e6 AS acf " +
          "FROM m ORDER BY event_type, lag")
    )
  )
}
