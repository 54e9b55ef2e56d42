package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 29: EXECUTE IMMEDIATE, temperature-sampled language
  * mixes, Gopher-style quality rules, and Hamming-sketch ANN.
  *
  *  - `sql_exec_immediate` pins the Spark-4 `EXECUTE IMMEDIATE` statement:
  *    SQL text held in a string (the dynamic-SQL idiom every BI tool and
  *    stored-procedure port needs) executed with named parameters bound
  *    via `USING` — parameterized, so the payload can't inject. The
  *    oracle inlines the same literals.
  *  - `data_temperature_mix` is temperature-based multilingual sampling
  *    (the multinomial α-smoothing used to build training mixes): weight
  *    each language (n_l/N)^α with α=0.3, normalize, and report the
  *    expected document allocation of a 10k budget plus the per-language
  *    upsampling factor. One |langs|-row aggregate, a 1-row broadcast
  *    total — nothing here scales with the data.
  *  - `text_gopher_rules` evaluates the published Gopher quality gates
  *    that are expressible over whitespace tokenization — word count in
  *    [50, 100k], mean word length in [3, 10], ≥2 distinct stopwords,
  *    type-token ratio > 0.3 — and reports the per-source rule funnel.
  *    All four rules are single-pass map-side lambdas over `split(text)`;
  *    the only shuffle is the |sources|-row final aggregate.
  *  - `vec_hamming_knn` is sign-sketch ANN: pack `dim<62` sign bits of
  *    each embedding into ONE int64 (a map-side `aggregate ∘ zip_with`
  *    HOF — no explode, no shuffle), broadcast the 8 query signatures,
  *    and rank by `bit_count(xor)` Hamming distance. Top-10 per query is
  *    computed in TWO stages — partition-salted partial top-10, then a
  *    final top-10 over the 64×10 survivors — so the per-query rank
  *    shuffle never concentrates the whole table on 8 keys at 100 TB.
  */
object Wave29Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "sql_exec_immediate",
      (s, dir) => {
        val v = s"ord_eim_${System.nanoTime()}"
        T(s, dir, "orders").createOrReplaceTempView(v)
        s.sql(
          s"EXECUTE IMMEDIATE 'SELECT o_orderpriority, " +
            "CAST(count(*) AS BIGINT) AS n, " +
            "sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / 1e2 " +
            s"AS revenue FROM $v " +
            "WHERE o_totalprice >= :minp AND o_orderstatus = :st " +
            "GROUP BY o_orderpriority ORDER BY o_orderpriority' " +
            "USING 150000.0 AS minp, 'F' AS st")
      },
      Some(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, " +
          "sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / 1e2 " +
          "AS revenue FROM orders " +
          "WHERE o_totalprice >= 150000.0 AND o_orderstatus = 'F' " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    ),
    Q(
      "data_temperature_mix",
      // budget = 10k docs, α = 0.3 (the T=1/α≈3.3 "temperature" that
      // flattens head languages). pow() is ≤1-ulp on both engines; every
      // emitted double is dround'ed well above ulp noise.
      (s, dir) => {
        val counts = T(s, dir, "documents")
          .groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .withColumn("w", pow(col("n_docs").cast("double"), lit(0.3)))
        val total = counts.agg(sum("w").as("tw"),
          sum("n_docs").as("tn"))
        counts.crossJoin(broadcast(total))
          .select(
            col("lang"), col("n_docs"),
            dround(col("n_docs") / col("tn"), 6).as("p_raw"),
            dround(col("w") / col("tw"), 6).as("p_temp"),
            round(col("w") / col("tw") * 10000).cast("long")
              .as("budget_docs"),
            dround(col("w") / col("tw") * 10000 / col("n_docs"), 4)
              .as("upsample_factor"))
          .orderBy("lang")
      },
      Some(
        "WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "pow(CAST(count(*) AS DOUBLE), 0.3) AS w FROM documents " +
          "GROUP BY lang), " +
          "t AS (SELECT sum(w) AS tw, sum(n_docs) AS tn FROM c) " +
          "SELECT lang, n_docs, " +
          droundSql("n_docs / tn", 6) + " AS p_raw, " +
          droundSql("w / tw", 6) + " AS p_temp, " +
          "CAST(round(w / tw * 10000) AS BIGINT) AS budget_docs, " +
          droundSql("w / tw * 10000 / n_docs", 4) + " AS upsample_factor " +
          "FROM c, t ORDER BY lang")
    ),
    Q(
      "text_gopher_rules",
      (s, dir) => {
        val stops = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
        val docs = T(s, dir, "documents")
          .withColumn("words", split(col("text"), " "))
          .withColumn("wc", size(col("words")).cast("long"))
          .withColumn("mwl",
            (length(col("text")) - (col("wc") - 1)).cast("double") /
              col("wc"))
          .withColumn("uniq", array_distinct(col("words")))
          .withColumn("r_wordcount",
            col("wc") >= 50 && col("wc") <= 100000)
          .withColumn("r_meanwordlen", col("mwl") >= 3 && col("mwl") <= 10)
          .withColumn("r_stopwords",
            size(array_intersect(col("uniq"), stops)) >= 2)
          .withColumn("r_typetoken",
            size(col("uniq")).cast("double") / col("wc") > 0.3)
        docs.groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("r_wordcount"), 1L).otherwise(0L)).as("p_wc"),
            sum(when(col("r_meanwordlen"), 1L).otherwise(0L)).as("p_mwl"),
            sum(when(col("r_stopwords"), 1L).otherwise(0L)).as("p_stop"),
            sum(when(col("r_typetoken"), 1L).otherwise(0L)).as("p_ttr"),
            sum(when(col("r_wordcount") && col("r_meanwordlen") &&
              col("r_stopwords") && col("r_typetoken"), 1L).otherwise(0L))
              .as("p_all"))
          .orderBy("source")
      },
      Some(
        "WITH d AS (SELECT source, " +
          "string_split(text, ' ') AS words, " +
          "CAST(len(string_split(text, ' ')) AS BIGINT) AS wc, " +
          "CAST(length(text) - (len(string_split(text, ' ')) - 1) " +
          "AS DOUBLE) / len(string_split(text, ' ')) AS mwl, " +
          "list_distinct(string_split(text, ' ')) AS uniq " +
          "FROM documents), " +
          "r AS (SELECT source, " +
          "wc >= 50 AND wc <= 100000 AS r_wc, " +
          "mwl >= 3 AND mwl <= 10 AS r_mwl, " +
          "len(list_intersect(uniq, ['the','a','of','and','to'])) >= 2 " +
          "AS r_stop, " +
          "CAST(len(uniq) AS DOUBLE) / wc > 0.3 AS r_ttr FROM d) " +
          "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS p_wc, " +
          "CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS p_mwl, " +
          "CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS p_stop, " +
          "CAST(sum(CASE WHEN r_ttr THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS p_ttr, " +
          "CAST(sum(CASE WHEN r_wc AND r_mwl AND r_stop AND r_ttr " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS p_all " +
          "FROM r GROUP BY source ORDER BY source")
    ),
    Q(
      "vec_hamming_knn",
      (s, dir) => {
        val sig = T(s, dir, "embeddings")
          .select(col("vec_id"), expr(
            "aggregate(zip_with(slice(embedding, 1, 62), sequence(0, 61), " +
              "(x, i) -> CASE WHEN x > CAST(0 AS FLOAT) " +
              "THEN shiftleft(CAST(1 AS BIGINT), i) " +
              "ELSE CAST(0 AS BIGINT) END), " +
              "CAST(0 AS BIGINT), (a, b) -> a | b)").as("sg"))
        val q = sig.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("sg").as("qs"))
        val pairs = sig.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("dist",
            bit_count(col("sg").bitwiseXOR(col("qs"))).cast("long"))
        // two-stage top-k: salt the first rank so no single query key
        // receives the whole table; the survivors (≤64×10 per query) fit
        // the final per-query rank trivially
        val salted = pairs
          .withColumn("salt", pmod(xxhash64(col("vec_id")), lit(64)))
          .withColumn("r1", row_number().over(Window
            .partitionBy("query_id", "salt")
            .orderBy(col("dist"), col("vec_id"))))
          .filter(col("r1") <= 10)
        salted
          .withColumn("rank", row_number().over(Window
            .partitionBy("query_id")
            .orderBy(col("dist"), col("vec_id"))).cast("long"))
          .filter(col("rank") <= 10)
          .select("query_id", "rank", "vec_id", "dist")
          .orderBy("query_id", "rank")
      },
      Some(
        "WITH sig AS (SELECT vec_id, (SELECT sum(" +
          "CASE WHEN embedding[CAST(i AS INT)] > 0 " +
          "THEN 1::BIGINT << CAST(i - 1 AS INT) ELSE 0 END) " +
          "FROM range(1, 63) t(i)) AS sg FROM embeddings), " +
          "q AS (SELECT vec_id AS query_id, sg AS qs FROM sig " +
          "WHERE vec_id < 8), " +
          "p AS (SELECT query_id, vec_id, " +
          "CAST(bit_count(xor(sg, qs)) AS BIGINT) AS dist, " +
          "row_number() OVER (PARTITION BY query_id " +
          "ORDER BY bit_count(xor(sg, qs)), vec_id) AS rk " +
          "FROM sig, q WHERE vec_id <> query_id) " +
          "SELECT query_id, CAST(rk AS BIGINT) AS rank, vec_id, dist " +
          "FROM p WHERE rk <= 10 ORDER BY query_id, rank")
    )
  )
}
