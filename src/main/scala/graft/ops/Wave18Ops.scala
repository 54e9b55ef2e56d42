package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 18: bounded-match joins + curation scoring idioms.
  *
  *  - `join_asof_tolerance`: as-of join with a MAX-GAP bound (the
  *    pandas merge_asof `tolerance` semantics) — a stale match is no
  *    match. Same union-ordered window scan as `join_asof`; the bound
  *    is one comparison, not a second join.
  *  - `text_novelty_ratio`: per-document fraction of shingles first
  *    seen in an EARLIER document — the novelty score dedup-ordering
  *    curricula threshold on (low novelty = mostly recycled text).
  *  - `win_reset_running_sum`: running sum that RESETS after each
  *    marker row — cumulative-flag segmentation (the reset-on-event
  *    idiom: two stacked windows, no self-join).
  *  - `sql_values_table`: inline VALUES as a first-class relation
  *    (broadcast lookup without a file).
  */
object Wave18Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "join_asof_tolerance",
      // attribution with a freshness bound: each purchase takes the
      // latest click by the same user at or before it, but only within
      // 30 minutes — older clicks attribute nothing (NULL). The
      // tolerance is a filter on the matched timestamp, so the plan is
      // identical to the unbounded as-of: one shuffle on user_id, one
      // partition-bounded window scan, no range join, no second pass.
      (s, dir) => {
        val w = Window
          .partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"))
          .withColumn("asof",
            last(when(col("event_type") === "click", col("ts")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .withColumn("fresh",
            col("asof").isNotNull &&
              unix_timestamp(col("ts")) - unix_timestamp(col("asof"))
                <= 1800)
          .select(
            col("user_id"), col("event_id"),
            date_trunc("second", col("ts")).cast("timestamp_ntz")
              .as("p_ts"),
            when(col("fresh"),
              date_trunc("second", col("asof")).cast("timestamp_ntz"))
              .as("click_ts"),
            col("fresh").as("attributed"))
          .orderBy("user_id", "event_id")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, " +
          "CAST(ts AS TIMESTAMP) AS ts, event_type FROM events " +
          "WHERE event_type IN ('click','purchase')), " +
          "t AS (SELECT user_id, event_id, ts, event_type, " +
          "last_value(CASE WHEN event_type = 'click' THEN ts END " +
          "IGNORE NULLS) OVER (PARTITION BY user_id " +
          "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING " +
          "AND CURRENT ROW) AS asof_ts FROM e), " +
          "p AS (SELECT *, (asof_ts IS NOT NULL AND " +
          "date_diff('second', asof_ts, ts) <= 1800) AS fresh FROM t " +
          "WHERE event_type = 'purchase') " +
          "SELECT user_id, event_id, date_trunc('second', ts) AS p_ts, " +
          "CASE WHEN fresh THEN date_trunc('second', asof_ts) END " +
          "AS click_ts, fresh AS attributed FROM p " +
          "ORDER BY user_id, event_id")
    ),
    Q(
      "text_novelty_ratio",
      // novelty = the fraction of a document's distinct 3-token
      // shingles NOT already present in any earlier document (first
      // occurrence = min doc_id over the corpus). Shingle → min-owner
      // is one hash aggregate; the join back is keyed by shingle hash.
      // Low-novelty documents are recycled text — the ordering signal
      // dedup curricula sort on.
      (s, dir) => {
        val shingles = T(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("tk"))
          .withColumn("n", size(col("tk")).cast("long"))
          .filter(col("n") >= 3)
          .withColumn("pos", explode(expr("sequence(1L, n - 2)")))
          .select(col("doc_id"),
            md5(expr("concat_ws(' ', slice(tk, CAST(pos AS INT), 3))"))
              .as("sh"))
          .distinct()
        val firstOwner = shingles.groupBy("sh")
          .agg(min("doc_id").as("first_doc"))
        shingles.join(firstOwner, Seq("sh"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum((col("first_doc") === col("doc_id")).cast("long"))
              .as("n_novel"))
          .select(col("doc_id"), col("n_shingles"),
            dround(col("n_novel").cast("double") / col("n_shingles"), 6)
              .as("novelty"))
          .orderBy("doc_id")
      },
      Some(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk " +
          "FROM documents), " +
          "sh AS (SELECT DISTINCT doc_id, md5(array_to_string(" +
          "tk[p:p+2], ' ')) AS sh FROM t, " +
          "unnest(range(1, CAST(len(tk) AS BIGINT) - 1)) AS u(p) " +
          "WHERE len(tk) >= 3), " +
          "f AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY 1) " +
          "SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, " +
          droundSql("CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 " +
            "ELSE 0 END) AS DOUBLE) / count(*)", 6) + " AS novelty " +
          "FROM sh s JOIN f ON s.sh = f.sh GROUP BY s.doc_id " +
          "ORDER BY s.doc_id")
    ),
    Q(
      "win_reset_running_sum",
      // running spend per user that RESETS after each purchase: the
      // cumulative count of PRIOR purchases segments each user's
      // timeline, and the running sum restarts inside each segment —
      // two stacked partition-bounded windows, the reset-on-event
      // idiom with no self-join and no island table.
      (s, dir) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val seg = Window.partitionBy("user_id", "seg")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
          .withColumn("seg",
            sum((col("event_type") === "purchase").cast("long"))
              .over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("seg", coalesce(col("seg"), lit(0L)))
          .withColumn("run", (sum(col("cents")).over(seg) / 100.0)
            .as("run"))
          .select(col("user_id"), col("event_id"), col("seg"),
            dround(col("run"), 2).as("running_value"))
          .orderBy("user_id", "event_id")
      },
      Some(
        "WITH e AS (SELECT user_id, event_id, " +
          "CAST(ts AS TIMESTAMP) AS ts, event_type, " +
          "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
          "s AS (SELECT *, coalesce(sum(CASE WHEN event_type = " +
          "'purchase' THEN 1 ELSE 0 END) OVER (PARTITION BY user_id " +
          "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING " +
          "AND 1 PRECEDING), 0) AS seg FROM e) " +
          "SELECT user_id, event_id, CAST(seg AS BIGINT) AS seg, " +
          droundSql("CAST(sum(cents) OVER (PARTITION BY user_id, seg " +
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING " +
            "AND CURRENT ROW) AS DOUBLE) / 100.0", 2) +
          " AS running_value FROM s ORDER BY user_id, event_id")
    ),
    Q(
      "sql_values_table",
      // inline VALUES as a relation: a literal lookup table (segment →
      // priority tier) joined against data with no file and no temp
      // view churn — it plans as a broadcast of a LocalRelation.
      (s, dir) => {
        T(s, dir, "customer").createOrReplaceTempView("w18_cust")
        s.sql(
          "SELECT t.tier, CAST(count(*) AS BIGINT) AS n, " +
            s"${dsumSql("c.c_acctbal", 2)} AS balance " +
            "FROM w18_cust c " +
            "JOIN (VALUES ('AUTOMOBILE', 'high'), ('BUILDING', 'high')," +
            " ('MACHINERY', 'mid'), ('FURNITURE', 'mid'), " +
            "('HOUSEHOLD', 'low')) AS t(seg, tier) " +
            "ON c.c_mktsegment = t.seg " +
            "GROUP BY t.tier ORDER BY t.tier")
      },
      Some(
        "SELECT t.tier, CAST(count(*) AS BIGINT) AS n, " +
          s"${dsumSql("c.c_acctbal", 2)} AS balance " +
          "FROM customer c " +
          "JOIN (VALUES ('AUTOMOBILE', 'high'), ('BUILDING', 'high'), " +
          "('MACHINERY', 'mid'), ('FURNITURE', 'mid'), " +
          "('HOUSEHOLD', 'low')) AS t(seg, tier) " +
          "ON c.c_mktsegment = t.seg " +
          "GROUP BY t.tier ORDER BY t.tier")
    )
  )
}
