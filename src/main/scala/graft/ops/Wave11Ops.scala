package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Round-4 wave 11: lexical-diversity scoring and product-analytics
  * stickiness.
  *
  *  - `text_mattr`: moving-average type-token ratio — TTR over every
  *    sliding 50-token window, averaged per doc. Robust to length where
  *    global TTR is not (the standard MATTR curation signal). Window
  *    distinct counts are per-row higher-order-function evaluations
  *    (integers), so cross-engine parity is exact; only the final mean
  *    divides, integer-sum first.
  *  - `events_dau_wau`: DAU / trailing-7-day WAU stickiness per day.
  *    Distinct-over-a-RANGE-window doesn't exist in either engine; the
  *    scale-honest shape is to EXPLODE each (user, active-day) into the 7
  *    window days it covers and count distinct users per covered day —
  *    shuffle volume is 7× the activity table, never user × days.
  */
object Wave11Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "text_mattr",
      (s, dir) => {
        val docs = T(s, dir, "documents")
          .filter(col("lang") === "en")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 50)
        docs.select(col("doc_id"),
            size(col("toks")).cast("long").as("n_toks"),
            expr("transform(sequence(1, size(toks) - 49), " +
              "i -> size(array_distinct(slice(toks, i, 50))))").as("wins"))
          .select(col("doc_id"), col("n_toks"),
            size(col("wins")).cast("long").as("n_windows"),
            expr("aggregate(wins, 0L, (acc, x) -> acc + x)").as("ttr_sum"))
          .withColumn("mattr",
            round(col("ttr_sum") / (col("n_windows") * 50.0) * 1e6) / 1e6)
          .select("doc_id", "n_toks", "n_windows", "mattr")
          .orderBy("doc_id")
      },
      Some(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks " +
          "FROM documents WHERE lang = 'en'), " +
          "f AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) " +
          "AS n_toks FROM t WHERE len(toks) >= 50), " +
          "w AS (SELECT doc_id, n_toks, " +
          "list_transform(generate_series(1, len(toks) - 49), " +
          "i -> len(list_distinct(toks[i:i+49]))) AS wins FROM f) " +
          "SELECT doc_id, n_toks, " +
          "CAST(len(wins) AS BIGINT) AS n_windows, " +
          "round(list_sum(wins) / (len(wins) * 50.0) * 1e6) / 1e6 " +
          "AS mattr FROM w ORDER BY doc_id")
    ),
    Q(
      "stats_gini_activity",
      // Gini coefficient of per-user activity concentration:
      // G = 2·Σ(rank·c) / (n·Σc) − (n+1)/n over counts sorted ascending.
      // The global rank is the third use of the sharded prefix pattern
      // (stats_ks_drift, stats_mannwhitney_u): local row_number per
      // count-range shard + broadcast prefix row counts — a total order
      // by (count, user_id) with no single-partition window. Σ(rank·c)
      // and Σc are BIGINTs; one double formula at the end.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val counts = T(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("c"))
        val mm = counts.agg(min("c"), max("c")).collect()(0)
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val width = math.max((hi - lo) / 32 + 1, 1L)
        val sharded = counts.withColumn("shard",
          least(((col("c") - lo) / width).cast("long"), lit(31L)))
        val local = Window.partitionBy("shard")
          .orderBy(col("c"), col("user_id"))
        val prefixes = sharded.groupBy("shard")
          .agg(count(lit(1)).as("sn"))
        val wPrev = Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)
        val prev = prefixes
          .withColumn("pn", coalesce(sum("sn").over(wPrev), lit(0L)))
          .select("shard", "pn")
        val agg = sharded
          .withColumn("lrk", row_number().over(local).cast("long"))
          .join(broadcast(prev), "shard")
          .select(((col("lrk") + col("pn")) * col("c")).as("rc"),
            col("c"))
          .agg(count(lit(1)).as("n"), sum("rc").as("s1"), sum("c").as("sc"))
          .collect()(0)
        val (n, s1, sc) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
        val gini = 2.0 * s1 / (n.toDouble * sc) - (n + 1).toDouble / n
        T(s, dir, "events").limit(1).select(
          lit(n).as("n_users"), lit(sc).as("n_events"),
          lit(math.round(gini * 1e6) / 1e6).as("gini"))
      },
      Some(
        "WITH counts AS (SELECT user_id, count(*) AS c FROM events " +
          "GROUP BY user_id), " +
          "r AS (SELECT c, row_number() OVER (ORDER BY c, user_id) " +
          "AS rk FROM counts), " +
          "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(rk * c) AS BIGINT) AS s1, " +
          "CAST(sum(c) AS BIGINT) AS sc FROM r) " +
          "SELECT n AS n_users, sc AS n_events, " +
          "round((2.0 * s1 / (CAST(n AS DOUBLE) * sc) - " +
          "CAST(n + 1 AS DOUBLE) / n) * 1e6) / 1e6 AS gini FROM m")
    ),
    Q(
      "text_mix_entropy",
      // corpus-mixture balance gate: per lang, the Shannon entropy of its
      // source mixture (nats) and the evenness ratio H/ln(k) a curation
      // pipeline thresholds before training. Each -p·ln(p) term is
      // quantized to 1e9 and integer-summed (the chi²/PSI determinism
      // trick), so engine-side float summation order cannot move H.
      (s, dir) => {
        val counts = T(s, dir, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("c"))
        val perLang = org.apache.spark.sql.expressions.Window
          .partitionBy("lang")
        counts
          .withColumn("tot", sum("c").over(perLang))
          .select(col("lang"),
            round(-(col("c") / col("tot").cast("double")) *
              log(col("c") / col("tot").cast("double")) * 1e9)
              .cast("long").as("term"))
          .groupBy("lang")
          .agg(count(lit(1)).as("k"),
            (round(sum("term") / 1e9 * 1e6) / 1e6).as("h_nats"))
          .withColumn("evenness",
            round(col("h_nats") / log(col("k").cast("double")) * 1e6) / 1e6)
          .orderBy("lang")
      },
      Some(
        "WITH counts AS (SELECT lang, source, count(*) AS c " +
          "FROM documents GROUP BY 1, 2), " +
          "w AS (SELECT lang, c, " +
          "sum(c) OVER (PARTITION BY lang) AS tot FROM counts), " +
          "terms AS (SELECT lang, CAST(round(" +
          "-(c / CAST(tot AS DOUBLE)) * ln(c / CAST(tot AS DOUBLE)) " +
          "* 1e9) AS BIGINT) AS term FROM w), " +
          "h AS (SELECT lang, CAST(count(*) AS BIGINT) AS k, " +
          "round(sum(term) / 1e9 * 1e6) / 1e6 AS h_nats " +
          "FROM terms GROUP BY lang) " +
          "SELECT lang, k, h_nats, " +
          "round(h_nats / ln(CAST(k AS DOUBLE)) * 1e6) / 1e6 AS evenness " +
          "FROM h ORDER BY lang")
    ),
    Q(
      "events_dau_wau",
      (s, dir) => {
        val active = T(s, dir, "events")
          .select(col("user_id"),
            date_trunc("day", col("ts")).as("day"))
          .distinct()
        val dau = active.groupBy("day")
          .agg(countDistinct("user_id").as("dau"))
        // explode each active day into the 7 trailing windows it feeds
        val wau = active
          .select(col("user_id"), explode(expr(
            "sequence(day, day + INTERVAL 6 DAYS, INTERVAL 1 DAY)"))
            .as("day"))
          .groupBy("day")
          .agg(countDistinct("user_id").as("wau"))
        dau.join(wau, "day")
          // sequence()+INTERVAL promotes ntz to session-local timestamps;
          // pin the output back to ntz so the comparator sees naive days
          .select(col("day").cast("timestamp_ntz").as("day"),
            col("dau"), col("wau"),
            (round(col("dau") / col("wau").cast("double") * 1e6) / 1e6)
              .as("stickiness"))
          .orderBy("day")
      },
      Some(
        "WITH active AS (SELECT DISTINCT user_id, " +
          "CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) " +
          "AS day FROM events), " +
          "dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) " +
          "AS dau FROM active GROUP BY day), " +
          "cov AS (SELECT user_id, day + to_days(CAST(d.g AS INTEGER)) AS day " +
          "FROM active, generate_series(0, 6) d(g)), " +
          "wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) " +
          "AS wau FROM cov GROUP BY day) " +
          "SELECT dau.day, dau.dau, wau.wau, " +
          "round(dau.dau / CAST(wau.wau AS DOUBLE) * 1e6) / 1e6 " +
          "AS stickiness " +
          "FROM dau JOIN wau ON dau.day = wau.day ORDER BY dau.day")
    )
  )
}
