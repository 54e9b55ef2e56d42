package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 33: private release counts, CCNet-style LM bucketing,
  * and journey-prefix analytics.
  *
  *  - `data_dp_counts` releases per-language document counts under pure
  *    ε-DP (ε = ln 2) with the DISCRETE (two-sided geometric) Laplace
  *    mechanism: P(X=k) ∝ 2^{-|k|}, drawn by inverse-CDF over exact
  *    rational thresholds (1/48, 1/24, …) from an integer LCG seeded on
  *    the group key — deterministic, so both engines release the same
  *    noised table. The per-group noise is O(1) driver-free map work; at
  *    any scale the mechanism costs one aggregate.
  *  - `text_ccnet_buckets` is CCNet's language-model filtering stage:
  *    score each doc by its mean word log-frequency under the corpus
  *    unigram LM (integer-grid ln, exact int sums), then `ntile(3)` per
  *    language → head/middle/tail with per-bucket stats. Head = most
  *    fluent (highest mean log-freq). One explode + broadcast vocab
  *    join + one window per language.
  *  - `events_top_paths` ranks the 10 most common 3-event journey
  *    prefixes — the product-analytics "top user paths" report — from
  *    the same ordered-journey aggregate as `events_seq_regex`.
  */
object Wave33Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "data_dp_counts",
      (s, dir) => {
        // thresholds: P(X ≤ k) for the two-sided geometric with a = 1/2
        val cdf = Seq(
          -5 -> 1.0 / 48, -4 -> 1.0 / 24, -3 -> 1.0 / 12, -2 -> 1.0 / 6,
          -1 -> 1.0 / 3, 0 -> 2.0 / 3, 1 -> 5.0 / 6, 2 -> 11.0 / 12,
          3 -> 23.0 / 24, 4 -> 47.0 / 48)
        val noise = cdf.foldRight(lit(5)) { case ((k, c), e) =>
          when(col("u") < c, k).otherwise(e)
        }.cast("long")
        T(s, dir, "documents")
          .groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .withColumn("seed",
            ascii(substring(col("lang"), 1, 1)) * 256 +
              ascii(substring(col("lang"), 2, 1)))
          .withColumn("u",
            ((col("seed").cast("long") * 1103515245L + 12345L)
              % 2147483647L).cast("double") / 2147483647.0)
          .select(col("lang"),
            greatest(col("n_docs") + noise, lit(0L)).as("dp_docs"),
            dround(lit(math.log(2)), 6).as("epsilon"))
          .orderBy("lang")
      },
      Some(
        "WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "ascii(substring(lang, 1, 1)) * 256 + " +
          "ascii(substring(lang, 2, 1)) AS seed FROM documents " +
          "GROUP BY lang) " +
          "SELECT lang, greatest(n_docs + CASE " +
          "WHEN u < 1.0/48 THEN -5 WHEN u < 1.0/24 THEN -4 " +
          "WHEN u < 1.0/12 THEN -3 WHEN u < 1.0/6 THEN -2 " +
          "WHEN u < 1.0/3 THEN -1 WHEN u < 2.0/3 THEN 0 " +
          "WHEN u < 5.0/6 THEN 1 WHEN u < 11.0/12 THEN 2 " +
          "WHEN u < 23.0/24 THEN 3 WHEN u < 47.0/48 THEN 4 " +
          "ELSE 5 END, 0) AS dp_docs, " +
          droundSql("ln(2)", 6) + " AS epsilon " +
          "FROM (SELECT lang, n_docs, " +
          "CAST((CAST(seed AS BIGINT) * 1103515245 + 12345) " +
          "% 2147483647 AS DOUBLE) / 2147483647.0 AS u FROM c) " +
          "ORDER BY lang")
    ),
    Q(
      "text_ccnet_buckets",
      (s, dir) => {
        val words = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("w"))
        val freq = words.groupBy("w").agg(count(lit(1)).as("cw"))
        val scored = words.join(broadcast(freq), "w")
          .withColumn("li", round(log(col("cw").cast("double")) * 1e9)
            .cast("long"))
          .groupBy("doc_id", "lang")
          .agg((sum("li").cast("double") / count(lit(1)) / 1e9)
            .as("score"))
        val w = Window.partitionBy("lang")
          .orderBy(col("score").desc, col("doc_id"))
        scored
          .withColumn("bucket", ntile(3).over(w).cast("long"))
          .groupBy("lang", "bucket")
          .agg(
            count(lit(1)).as("n_docs"),
            dround(avg(round(col("score") * 1e6).cast("long")) / 1e6, 4)
              .as("mean_logfreq"))
          .orderBy("lang", "bucket")
      },
      Some(
        "WITH words AS (SELECT doc_id, lang, unnest(string_split(" +
          "text, ' ')) AS w FROM documents), " +
          "freq AS (SELECT w, count(*) AS cw FROM words GROUP BY w), " +
          "scored AS (SELECT doc_id, lang, " +
          "CAST(sum(CAST(round(ln(CAST(cw AS DOUBLE)) * 1e9) AS BIGINT))" +
          " AS DOUBLE) / count(*) / 1e9 AS score " +
          "FROM words JOIN freq USING (w) GROUP BY doc_id, lang), " +
          "b AS (SELECT lang, ntile(3) OVER (PARTITION BY lang " +
          "ORDER BY score DESC, doc_id) AS bucket, score FROM scored) " +
          "SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs, " +
          droundSql(
            "avg(CAST(round(score * 1e6) AS BIGINT)) / 1e6", 4) +
          " AS mean_logfreq FROM b GROUP BY lang, bucket " +
          "ORDER BY lang, bucket")
    ),
    Q(
      "events_top_paths",
      (s, dir) => {
        val code = when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .when(col("event_type") === "signup", "s")
          .otherwise("e")
        T(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            code.as("c"))
          .groupBy("user_id")
          .agg(substring(expr("array_join(transform(array_sort(" +
            "collect_list(struct(ts, event_id, c))), x -> x.c), '')"),
            1, 3).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_users"))
          .withColumn("rank", row_number().over(Window
            .orderBy(col("n_users").desc, col("path"))).cast("long"))
          .filter(col("rank") <= 10)
          .select("rank", "path", "n_users")
          .orderBy("rank")
      },
      // the final rank window is over the ≤|alphabet|³ = 125-row path
      // census, not the data — a driver-scale relation by construction
      Some(
        "WITH j AS (SELECT user_id, substring(string_agg(" +
          "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' " +
          "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' " +
          "ELSE 'e' END, '' ORDER BY CAST(ts AS TIMESTAMP), event_id), " +
          "1, 3) AS path FROM events GROUP BY user_id), " +
          "t AS (SELECT path, CAST(count(*) AS BIGINT) AS n_users, " +
          "row_number() OVER (ORDER BY count(*) DESC, path) AS rank " +
          "FROM j GROUP BY path) " +
          "SELECT CAST(rank AS BIGINT) AS rank, path, n_users FROM t " +
          "WHERE rank <= 10 ORDER BY rank")
    )
  )
}
