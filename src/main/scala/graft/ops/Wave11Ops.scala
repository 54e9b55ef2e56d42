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
