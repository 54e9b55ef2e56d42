package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 52: corpus drift, snapshot reconciliation, forecast
  * backtesting, and shuffle-skew pre-flight.
  *
  *  - `text_js_divergence`: pairwise Jensen-Shannon divergence between
  *    the unigram distributions of every source pair — the standard
  *    "how different are these two crawls" number that drives mixing
  *    decisions. The (pair × vocab) grid is generated explicitly so
  *    tokens present in only one source contribute their full
  *    half-KL term; per-token terms are 1e9-scaled to integers before
  *    summation (associative), and the pair space is |sources|² —
  *    bounded. Vocab-keyed joins shuffle on `tok`, the right key at
  *    corpus scale.
  *  - `data_reconcile_snapshots`: migration-validation row-hash
  *    reconciliation. A deterministically perturbed copy of orders
  *    (LCG: ~1% price-shifted, ~1% dropped, ~0.5% duplicated under
  *    synthetic keys) is full-outer joined to the original on the
  *    primary key, comparing md5 row fingerprints — the
  *    matched / changed / only-left / only-right census every
  *    engine-migration signoff needs. One co-partitioned join; row
  *    hashes are computed map-side, so only (key, 32-char digest)
  *    shuffles.
  *  - `ts_forecast_backtest`: backtest scorecard for the two
  *    standard forecasting baselines on the daily event-value series —
  *    naive (yesterday) vs seasonal-naive (7 observations back), MAE
  *    on exact cent-scaled integers and the resulting skill score
  *    1 − MAE_sn/MAE_naive per event type. Lags are per-type windows
  *    over the day-level aggregate (|calendar| rows, bounded), not the
  *    raw events.
  *  - `data_bucket_skew_audit`: pre-flight skew detector — hash a
  *    candidate join/partition key into 256 md5 buckets and report
  *    max/avg load, the skew ratio, and the p99-ish tail, the numbers
  *    that decide salting BEFORE a 100 TB shuffle instead of after it
  *    straggles. One linear aggregate; only bucket digests shuffle.
  */
object Wave52Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "text_js_divergence",
      (s, dir) => {
        val tk = T(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        val cnt = tk.groupBy("source", "tok").agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy("source").agg(sum("c").as("tot"))
        val d = cnt.join(broadcast(tot), Seq("source"))
          .select(col("source"), col("tok"),
            (col("c").cast("double") / col("tot")).as("p"))
        val vocab = tk.select("tok").distinct()
        val srcs = tot.select(col("source"))
        val pairs = srcs.as("a").crossJoin(srcs.as("b"))
          .filter(col("a.source") < col("b.source"))
          .select(col("a.source").as("s1"), col("b.source").as("s2"))
        val grid = pairs.crossJoin(vocab)
        val joined = grid
          .join(d.select(col("source").as("s1"), col("tok"),
            col("p").as("p1")), Seq("s1", "tok"), "left_outer")
          .join(d.select(col("source").as("s2"), col("tok"),
            col("p").as("p2")), Seq("s2", "tok"), "left_outer")
          .withColumn("p", coalesce(col("p1"), lit(0.0)))
          .withColumn("q", coalesce(col("p2"), lit(0.0)))
          .withColumn("term",
            when(col("p") > 0, col("p") *
              log(lit(2.0) * col("p") / (col("p") + col("q"))))
              .otherwise(0.0) * 0.5 +
              when(col("q") > 0, col("q") *
                log(lit(2.0) * col("q") / (col("p") + col("q"))))
                .otherwise(0.0) * 0.5)
        joined.groupBy("s1", "s2")
          .agg(count(lit(1)).as("n_toks"),
            (sum(round(col("term") * 1e9).cast("long")) / 1e9).as("jsr"))
          .select(col("s1"), col("s2"), col("n_toks"),
            dround(col("jsr"), 6).as("js_divergence"))
          .orderBy("s1", "s2")
      },
      Some(
        "WITH tk AS (SELECT source, unnest(string_split(text, ' ')) " +
          "AS tok FROM documents), " +
          "cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c " +
          "FROM tk GROUP BY 1, 2), " +
          "tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot " +
          "FROM cnt GROUP BY 1), " +
          "d AS (SELECT cnt.source, tok, CAST(c AS DOUBLE) / tot AS p " +
          "FROM cnt JOIN tot ON cnt.source = tot.source), " +
          "vocab AS (SELECT DISTINCT tok FROM tk), " +
          "pairs AS (SELECT a.source AS s1, b.source AS s2 " +
          "FROM tot a, tot b WHERE a.source < b.source), " +
          "grid AS (SELECT s1, s2, tok FROM pairs, vocab), " +
          "j AS (SELECT g.s1, g.s2, g.tok, " +
          "coalesce(d1.p, 0.0) AS p, coalesce(d2.p, 0.0) AS q " +
          "FROM grid g LEFT JOIN d d1 ON d1.source = g.s1 " +
          "AND d1.tok = g.tok LEFT JOIN d d2 ON d2.source = g.s2 " +
          "AND d2.tok = g.tok), " +
          "t AS (SELECT s1, s2, " +
          "CASE WHEN p > 0 THEN p * ln(2.0 * p / (p + q)) " +
          "ELSE 0.0 END * 0.5 + " +
          "CASE WHEN q > 0 THEN q * ln(2.0 * q / (p + q)) " +
          "ELSE 0.0 END * 0.5 AS term FROM j) " +
          "SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_toks, " +
          droundSql(
            "CAST(sum(CAST(round(term * 1e9) AS BIGINT)) AS BIGINT) " +
              "/ 1e9", 6) + " AS js_divergence " +
          "FROM t GROUP BY 1, 2 ORDER BY 1, 2")
    ),
    Q(
      "data_reconcile_snapshots",
      (s, dir) => {
        val left0 = T(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val u = ((col("k") * lit(1103515245L) + lit(12345L))
          % lit(2147483647L)).cast("double") / lit(2147483647.0)
        val perturbed = left0.withColumn("u", u)
          .filter(!(col("u") >= 0.01 && col("u") < 0.02)) // ~1% dropped
          .withColumn("cents", when(col("u") < 0.01,
            col("cents") + 100L).otherwise(col("cents"))) // ~1% shifted
        val extra = perturbed.filter(col("u") >= 0.02 && col("u") < 0.025)
          .withColumn("k", col("k") + lit(1000000000L)) // ~0.5% synthetic
        val right0 = perturbed.unionByName(extra).drop("u")
        def fp(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("h", md5(concat_ws("|",
            col("o_orderstatus"), col("cents").cast("string"))))
            .select(col("k"), col("h"))
        fp(left0).withColumnRenamed("h", "hl")
          .join(fp(right0).withColumnRenamed("h", "hr"),
            Seq("k"), "full_outer")
          .agg(
            sum((col("hl").isNotNull && col("hr").isNotNull &&
              col("hl") === col("hr")).cast("long")).as("n_match"),
            sum((col("hl").isNotNull && col("hr").isNotNull &&
              col("hl") =!= col("hr")).cast("long")).as("n_changed"),
            sum(col("hr").isNull.cast("long")).as("n_only_left"),
            sum(col("hl").isNull.cast("long")).as("n_only_right"))
      },
      Some(
        "WITH l AS (SELECT o_orderkey AS k, o_orderstatus, " +
          "CAST(round(o_totalprice * 100) AS BIGINT) AS cents " +
          "FROM orders), " +
          "p AS (SELECT k, o_orderstatus, " +
          "CASE WHEN u < 0.01 THEN cents + 100 ELSE cents END AS cents, " +
          "u FROM (SELECT l.*, " +
          "CAST((k * 1103515245 + 12345) % 2147483647 AS DOUBLE) " +
          "/ 2147483647.0 AS u FROM l) " +
          "WHERE NOT (u >= 0.01 AND u < 0.02)), " +
          "r AS (SELECT k, o_orderstatus, cents FROM p " +
          "UNION ALL SELECT k + 1000000000, o_orderstatus, cents " +
          "FROM p WHERE u >= 0.02 AND u < 0.025), " +
          "fl AS (SELECT k, md5(o_orderstatus || '|' || " +
          "CAST(cents AS VARCHAR)) AS hl FROM l), " +
          "fr AS (SELECT k, md5(o_orderstatus || '|' || " +
          "CAST(cents AS VARCHAR)) AS hr FROM r) " +
          "SELECT CAST(sum(CASE WHEN hl IS NOT NULL AND hr IS NOT " +
          "NULL AND hl = hr THEN 1 ELSE 0 END) AS BIGINT) AS n_match, " +
          "CAST(sum(CASE WHEN hl IS NOT NULL AND hr IS NOT NULL " +
          "AND hl <> hr THEN 1 ELSE 0 END) AS BIGINT) AS n_changed, " +
          "CAST(sum(CASE WHEN hr IS NULL THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS n_only_left, " +
          "CAST(sum(CASE WHEN hl IS NULL THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS n_only_right " +
          "FROM fl FULL OUTER JOIN fr USING (k)")
    ),
    Q(
      "ts_forecast_backtest",
      (s, dir) => {
        val daily = T(s, dir, "events")
          .groupBy(col("event_type"),
            to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("v"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val lagged = daily
          .withColumn("l1", lag("v", 1).over(w))
          .withColumn("l7", lag("v", 7).over(w))
          .filter(col("l1").isNotNull && col("l7").isNotNull)
        lagged.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            sum(abs(col("v") - col("l1"))).as("ae1"),
            sum(abs(col("v") - col("l7"))).as("ae7"))
          .select(col("event_type"), col("n_days"),
            dround(col("ae1").cast("double") / col("n_days") / 100.0, 2)
              .as("mae_naive"),
            dround(col("ae7").cast("double") / col("n_days") / 100.0, 2)
              .as("mae_seasonal"),
            dround(lit(1.0) - col("ae7").cast("double") / col("ae1"), 4)
              .as("skill"))
          .orderBy("event_type")
      },
      Some(
        "WITH daily AS (SELECT event_type, " +
          "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
          "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) " +
          "AS v FROM events GROUP BY 1, 2), " +
          "lg AS (SELECT event_type, v, " +
          "lag(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1, " +
          "lag(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS l7 " +
          "FROM daily), " +
          "f AS (SELECT * FROM lg WHERE l1 IS NOT NULL AND l7 IS NOT " +
          "NULL) SELECT event_type, CAST(count(*) AS BIGINT) AS n_days, " +
          droundSql("CAST(sum(abs(v - l1)) AS DOUBLE) / count(*) " +
            "/ 100.0", 2) + " AS mae_naive, " +
          droundSql("CAST(sum(abs(v - l7)) AS DOUBLE) / count(*) " +
            "/ 100.0", 2) + " AS mae_seasonal, " +
          droundSql("1.0 - CAST(sum(abs(v - l7)) AS DOUBLE) / " +
            "sum(abs(v - l1))", 4) + " AS skill " +
          "FROM f GROUP BY 1 ORDER BY 1")
    ),
    Q(
      "data_bucket_skew_audit",
      (s, dir) => {
        val b = T(s, dir, "lineitem")
          .groupBy(substring(md5(col("l_partkey").cast("string")), 1, 2)
            .as("bucket"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("n").desc, col("bucket"))
        b.withColumn("rk", row_number().over(w))
          .agg(count(lit(1)).as("n_buckets"),
            sum("n").as("n_rows"),
            max("n").as("max_load"),
            min("n").as("min_load"),
            sum(when(col("rk") <= 3, col("n")).otherwise(0L))
              .as("top3_rows"))
          .select(col("n_buckets"), col("n_rows"), col("max_load"),
            col("min_load"),
            dround(col("max_load") * col("n_buckets")
              .cast("double") / col("n_rows"), 4).as("skew_ratio"),
            dround(col("top3_rows").cast("double") / col("n_rows"), 6)
              .as("top3_share"))
      },
      Some(
        "WITH b AS (SELECT substring(md5(CAST(l_partkey AS VARCHAR)), " +
          "1, 2) AS bucket, CAST(count(*) AS BIGINT) AS n " +
          "FROM lineitem GROUP BY 1), " +
          "r AS (SELECT n, row_number() OVER (ORDER BY n DESC, bucket) " +
          "AS rk FROM b) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_buckets, " +
          "CAST(sum(n) AS BIGINT) AS n_rows, " +
          "CAST(max(n) AS BIGINT) AS max_load, " +
          "CAST(min(n) AS BIGINT) AS min_load, " +
          droundSql("max(n) * CAST(count(*) AS DOUBLE) / sum(n)", 4) +
          " AS skew_ratio, " +
          droundSql("CAST(sum(CASE WHEN rk <= 3 THEN n ELSE 0 END) " +
            "AS DOUBLE) / sum(n)", 6) + " AS top3_share FROM r")
    )
  )
}
