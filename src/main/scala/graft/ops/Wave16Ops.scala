package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 16: curation-pipeline screens + one SQL-surface idiom.
  *
  *  - `events_bot_regularity`: inter-event-gap coefficient of variation
  *    per user — the standard traffic screen (near-constant cadence =
  *    automation). Exact integer gap sums; one window + one aggregate.
  *  - `data_split_leakage`: duplicate-content groups that CROSS a
  *    train/test split — the leakage check every split must pass
  *    (content-hash dedup finds the groups; the split columns make
  *    crossing groups a HAVING filter).
  *  - `agg_hhi_index`: Herfindahl–Hirschman concentration of supplier
  *    revenue per nation, on a fixed 1e9 integer share grid so the
  *    sum of squared shares is an exact int64 on both engines.
  *  - `sql_star_except`: `SELECT * EXCEPT (…)` — projection by
  *    exclusion (the wide-table idiom), same scan/prune plan as an
  *    explicit column list.
  */
object Wave16Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "events_bot_regularity",
      // automation screen: users whose inter-event gaps are nearly
      // constant (cv = stddev/mean below 0.5) are bot-like. Gaps in
      // whole seconds (exact int64); variance from the closed form
      // n·Σg² − (Σg)² so both engines see identical integers, one
      // double sqrt/division at the end. Per-user window sort is
      // bounded by that user's event count.
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gaps = T(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("gap",
            (unix_timestamp(col("ts")) -
              unix_timestamp(lag("ts", 1).over(w))).cast("long"))
          .filter(col("gap").isNotNull)
        gaps.groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(col("gap")).as("s1"),
            sum(col("gap") * col("gap")).as("s2"))
          .filter(col("n") >= 5 && col("s1") > 0)
          .select(col("user_id"), col("n"),
            (col("s1") / col("n")).as("mean_gap_s"),
            dround(
              sqrt((col("n") * col("s2") - col("s1") * col("s1"))
                .cast("double")) / col("s1"), 6).as("cv"),
            (sqrt((col("n") * col("s2") - col("s1") * col("s1"))
              .cast("double")) / col("s1") < 0.5).as("bot_like"))
          .orderBy("user_id")
      },
      Some(
        "WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, " +
          "event_id FROM events), " +
          "g AS (SELECT user_id, CAST(date_diff('second', " +
          "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), " +
          "ts) AS BIGINT) AS gap FROM e), " +
          "a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(gap) AS BIGINT) AS s1, " +
          "CAST(sum(gap * gap) AS BIGINT) AS s2 FROM g " +
          "WHERE gap IS NOT NULL GROUP BY user_id) " +
          "SELECT user_id, n, CAST(s1 AS DOUBLE) / n AS mean_gap_s, " +
          droundSql("sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / s1", 6) +
          " AS cv, " +
          "(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / s1 < 0.5) " +
          "AS bot_like FROM a WHERE n >= 5 AND s1 > 0 " +
          "ORDER BY user_id")
    ),
    Q(
      "data_split_leakage",
      // split-leakage screen: duplicate-content groups with members on
      // BOTH sides of the train/test split. Content key = sorted
      // distinct token set (the corpus's planted duplicates are bag
      // permutations, not byte-exact — same key as text_dedup_groups);
      // the crossing test is two conditional counts per group — linear,
      // no join. A clean split pipeline gates on this being empty.
      (s, dir) => {
        val d = T(s, dir, "documents")
          .select(col("doc_id"),
            md5(concat_ws(" ",
              array_sort(array_distinct(split(col("text"), " ")))))
              .as("fp"),
            (col("doc_id") % 10 < 8).as("in_train"))
        d.groupBy("fp")
          .agg(sum(col("in_train").cast("long")).as("n_train"),
            sum((!col("in_train")).cast("long")).as("n_test"),
            min("doc_id").as("first_id"))
          .filter(col("n_train") >= 1 && col("n_test") >= 1)
          .select("fp", "n_train", "n_test", "first_id")
          .orderBy("first_id")
      },
      Some(
        "WITH d AS (SELECT doc_id, md5(array_to_string(list_sort(" +
          "list_distinct(string_split(text, ' '))), ' ')) AS fp, " +
          "(doc_id % 10 < 8) AS in_train FROM documents) " +
          "SELECT fp, " +
          "CAST(sum(CASE WHEN in_train THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_train, " +
          "CAST(sum(CASE WHEN in_train THEN 0 ELSE 1 END) AS BIGINT) " +
          "AS n_test, min(doc_id) AS first_id FROM d GROUP BY fp " +
          "HAVING sum(CASE WHEN in_train THEN 1 ELSE 0 END) >= 1 " +
          "AND sum(CASE WHEN in_train THEN 0 ELSE 1 END) >= 1 " +
          "ORDER BY first_id")
    ),
    Q(
      "agg_hhi_index",
      // market concentration: HHI of supplier revenue within each
      // nation. Shares on a FIXED 1e9 integer grid (cents·1e9 ÷ total,
      // truncating division — identical on both engines), so Σshare²
      // is an exact int64 (Σrᵢ² ≤ max·Σrᵢ = 1e18) and the one double
      // division at the end sees identical inputs. Two keyed
      // aggregates + a broadcast-sized nation join; no window.
      (s, dir) => {
        val rev = T(s, dir, "lineitem")
          .join(broadcast(T(s, dir, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").cast("long").as("nation"),
            col("s_suppkey"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("cents"))
        val tot = rev.groupBy("nation")
          .agg(sum(col("cents")).as("total"),
            count(lit(1)).as("suppliers"))
        rev.join(tot, Seq("nation"))
          .withColumn("r", expr("cents * 1000000000L div total"))
          .groupBy("nation")
          .agg(max(col("suppliers")).as("suppliers"),
            dround(sum(col("r") * col("r")).cast("double") / 1e18, 8)
              .as("hhi"))
          .orderBy("nation")
      },
      Some(
        "WITH rev AS (SELECT CAST(s_nationkey AS BIGINT) AS nation, " +
          "s_suppkey, " +
          "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "GROUP BY 1, 2), " +
          "tot AS (SELECT nation, CAST(sum(cents) AS BIGINT) AS total, " +
          "CAST(count(*) AS BIGINT) AS suppliers FROM rev GROUP BY 1), " +
          "sh AS (SELECT r.nation, t.suppliers, " +
          "(r.cents * 1000000000) // t.total AS r " +
          "FROM rev r JOIN tot t ON r.nation = t.nation) " +
          "SELECT nation, CAST(max(suppliers) AS BIGINT) AS suppliers, " +
          droundSql("CAST(sum(r * r) AS DOUBLE) / 1e18", 8) + " AS hhi " +
          "FROM sh GROUP BY nation ORDER BY nation")
    ),
    Q(
      "sql_star_except",
      // projection by EXCLUSION: SELECT * EXCEPT(cols) — the
      // wide-table idiom (keep everything but the bulky/PII columns).
      // Resolves at analysis time to an explicit projection, so column
      // pruning reaches the scan exactly as if the list were typed out.
      (s, dir) => {
        T(s, dir, "customer").createOrReplaceTempView("w16_cust")
        s.sql(
          "SELECT * EXCEPT (c_name, c_acctbal) FROM w16_cust " +
            "WHERE c_custkey <= 500 ORDER BY c_custkey")
      },
      Some(
        "SELECT * EXCLUDE (c_name, c_acctbal) FROM customer " +
          "WHERE c_custkey <= 500 ORDER BY c_custkey")
    )
  )
}
