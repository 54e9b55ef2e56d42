package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 19: time-weighted metrics, interval algebra, and
  * model-quality evaluation.
  *
  *  - `ts_time_weighted_avg`: TWAP-style value averaging — each
  *    observation weighted by how long it was "current" (seconds to
  *    the next event, day-bounded). The metric ops dashboards want
  *    when events arrive unevenly.
  *  - `ts_interval_union_len`: union length of overlapping intervals
  *    (the sweep-line idiom as windows: an interval starts a new
  *    island iff its start exceeds the running max of prior ends).
  *  - `text_code_score`: code-vs-prose scoring from symbol density —
  *    the code-filter signal for text curation, pure expressions.
  *  - `text_langid_eval`: confusion matrix of the lang-id heuristic
  *    against corpus labels — the evaluation harness for any
  *    classifier-based curation gate.
  */
object Wave19Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "ts_time_weighted_avg",
      // time-weighted average value per user-day: each event's value
      // holds until the next event (the last holds to midnight), so
      // weight = seconds current. All integer (seconds × cents ≤ 2.8e9
      // per term — exact int64 sums on both engines), one division at
      // the end. Window sort bounded per user-day.
      (s, dir) => {
        val w = Window.partitionBy("user_id", "day")
          .orderBy("sec", "event_id")
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            to_date(col("ts")).as("day"),
            unix_timestamp(col("ts")).as("sec"),
            round(col("value") * 100).cast("long").as("cents"))
          .withColumn("nxt",
            coalesce(lead("sec", 1).over(w),
              unix_timestamp(date_add(col("day"), 1)
                .cast("timestamp"))))
          .withColumn("wt", col("nxt") - col("sec"))
          .groupBy("user_id", "day")
          .agg(count(lit(1)).as("n"),
            dround(sum(col("wt") * col("cents")).cast("double") /
              sum(col("wt")) / 100.0, 4).as("twavg"))
          .orderBy("user_id", "day")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, " +
          "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
          "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec, " +
          "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
          "x AS (SELECT *, coalesce(lead(sec) OVER " +
          "(PARTITION BY user_id, day ORDER BY sec, event_id), " +
          "CAST(epoch(CAST(day + 1 AS TIMESTAMP)) AS BIGINT)) - sec AS wt FROM e) " +
          "SELECT user_id, day, CAST(count(*) AS BIGINT) AS n, " +
          droundSql("CAST(sum(wt * cents) AS DOUBLE) / sum(wt) / 100.0",
            4) + " AS twavg " +
          "FROM x GROUP BY user_id, day ORDER BY user_id, day")
    ),
    Q(
      "ts_interval_union_len",
      // activity coverage: each event opens a 30-minute interval; the
      // answer is the UNION length per user (overlaps merged). The
      // sweep line is two windows: an interval starts a new island iff
      // its start exceeds the running max of all prior ends; islands
      // then aggregate (max(end) − min(start)). No self-join, no
      // explode-to-seconds — the classic scalable interval-merge.
      (s, dir) => {
        val byU = Window.partitionBy("user_id")
          .orderBy("st", "event_id")
        val prevMaxEnd = max("en")
          .over(byU.rowsBetween(Window.unboundedPreceding, -1))
        val ev = T(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_timestamp(col("ts")).as("st"))
          .withColumn("en", col("st") + 1800)
        ev.withColumn("newisl",
            (col("st") > coalesce(prevMaxEnd, lit(Long.MinValue)))
              .cast("long"))
          .withColumn("isl", sum(col("newisl"))
            .over(byU.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "isl")
          .agg((max("en") - min("st")).as("len"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum("len").as("covered_s"))
          .orderBy("user_id")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, " +
          "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS st, " +
          "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + 1800 AS en FROM events), " +
          "m AS (SELECT *, CASE WHEN st > coalesce(max(en) OVER " +
          "(PARTITION BY user_id ORDER BY st, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
          "-9223372036854775808) THEN 1 ELSE 0 END AS newisl FROM e), " +
          "i AS (SELECT *, sum(newisl) OVER (PARTITION BY user_id " +
          "ORDER BY st, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
          "CURRENT ROW) AS isl FROM m), " +
          "g AS (SELECT user_id, isl, max(en) - min(st) AS len " +
          "FROM i GROUP BY 1, 2) " +
          "SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands, " +
          "CAST(sum(len) AS BIGINT) AS covered_s " +
          "FROM g GROUP BY user_id ORDER BY user_id")
    ),
    Q(
      "text_code_score",
      // code-vs-prose signal: density of code punctuation ({};=<>()[])
      // and of digit runs, both as exact character counts over the raw
      // text (strip-and-subtract — codegen'd string ops, no UDF, no
      // tokenizer). The combined score is what code filters threshold
      // on; the corpus is prose so the flag stays false — the SCORES
      // are the contract.
      (s, dir) => {
        val t = col("text")
        val codeChars = length(t) -
          length(regexp_replace(t, "[{};=<>()\\[\\]]", ""))
        val digits = length(t) - length(regexp_replace(t, "[0-9]", ""))
        T(s, dir, "documents")
          .select(col("doc_id"), length(t).cast("long").as("len"),
            codeChars.cast("long").as("n_sym"),
            digits.cast("long").as("n_dig"))
          .withColumn("score",
            dround((col("n_sym") * 3 + col("n_dig")).cast("double") /
              col("len"), 6))
          .withColumn("is_code", col("score") > 0.08)
          .orderBy("doc_id")
      },
      Some(
        "WITH t AS (SELECT doc_id, text, " +
          "CAST(length(text) AS BIGINT) AS len, " +
          "CAST(length(text) - length(regexp_replace(text, " +
          "'[{};=<>()\\[\\]]', '', 'g')) AS BIGINT) AS n_sym, " +
          "CAST(length(text) - length(regexp_replace(text, '[0-9]', " +
          "'', 'g')) AS BIGINT) AS n_dig FROM documents) " +
          "SELECT doc_id, len, n_sym, n_dig, " +
          droundSql("CAST(n_sym * 3 + n_dig AS DOUBLE) / len", 6) +
          " AS score, " +
          "(" + droundSql("CAST(n_sym * 3 + n_dig AS DOUBLE) / len", 6) +
          " > 0.08) AS is_code " +
          "FROM t ORDER BY doc_id")
    ),
    Q(
      "text_langid_eval",
      // classifier evaluation: confusion matrix of the pure-expression
      // lang-id heuristic (text_lang_id's langIdExpr) against the
      // corpus labels, with per-cell share of the true class — the
      // standard quality gate before trusting a curation classifier.
      // One aggregate over the scored frame; the per-truth total rides
      // a window over the tiny matrix.
      (s, dir) => {
        val scored = T(s, dir, "documents")
          .select(col("lang"),
            TextOps.langIdExpr(col("text")).as("pred"))
        val m = scored.groupBy("lang", "pred")
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("lang")
        m.withColumn("share",
            dround(col("n").cast("double") / sum("n").over(w), 6))
          .orderBy("lang", "pred")
      },
      Some(
        "WITH t AS (SELECT doc_id, lang, text, " +
          "regexp_split_to_array(lower(text), '\\s+') AS toks " +
          "FROM documents), " +
          "c AS (SELECT doc_id, lang, " +
          "len(list_filter(toks, x -> x IN ('der','die','das','und'," +
          "'ist','ein','mit','für','nicht'))) AS n_de, " +
          "len(list_filter(toks, x -> x IN ('the','and','of','to'," +
          "'is','with','that','for'))) AS n_en, " +
          "len(list_filter(toks, x -> x IN ('el','los','las','y','es'," +
          "'una','que','por','con'))) AS n_es, " +
          "len(list_filter(toks, x -> x IN ('le','la','les','et','de'," +
          "'est','une','que','pour'))) AS n_fr, " +
          "len(regexp_extract_all(text, '[\\x{4E00}-\\x{9FFF}" +
          "\\x{3400}-\\x{4DBF}\\x{F900}-\\x{FAFF}" +
          "\\x{20000}-\\x{2FA1F}]')) AS ncjk, " +
          "length(text) AS lc FROM t), " +
          "p AS (SELECT lang, " +
          "CASE WHEN CAST(ncjk AS DOUBLE) > CAST(lc AS DOUBLE) * 0.2 " +
          "THEN 'zh' " +
          "WHEN greatest(n_de,n_en,n_es,n_fr) = 0 THEN 'en' " +
          "WHEN n_de = greatest(n_de,n_en,n_es,n_fr) THEN 'de' " +
          "WHEN n_en = greatest(n_de,n_en,n_es,n_fr) THEN 'en' " +
          "WHEN n_es = greatest(n_de,n_en,n_es,n_fr) THEN 'es' " +
          "ELSE 'fr' END AS pred FROM c), " +
          "m AS (SELECT lang, pred, CAST(count(*) AS BIGINT) AS n " +
          "FROM p GROUP BY 1, 2) " +
          "SELECT lang, pred, n, " +
          droundSql("CAST(n AS DOUBLE) / sum(n) OVER " +
            "(PARTITION BY lang)", 6) + " AS share " +
          "FROM m ORDER BY lang, pred")
    )
  )
}
