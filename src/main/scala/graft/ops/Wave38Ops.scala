package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-8 wave 38: data-quality profiling + corpus statistics for
  * training-data pipelines.
  *
  *  - `data_profile_table` is the Deequ/Great-Expectations-style column
  *    profile: one output row per column with completeness (non-null
  *    rate), distinct count, and canonical min/max — the first report
  *    any ingest pipeline runs. One pass over the table computes every
  *    column's aggregates side by side (a single hash-agg, no
  *    per-column scans); values render through engine-identical
  *    canonical forms (ints, dates, cent-scaled money) so the profile
  *    is oracle-exact.
  *  - `text_stopword_detect` derives the stopword list FROM the corpus:
  *    tokens whose document frequency exceeds 40% of a language's
  *    docs. Corpus-derived beats a fixed list for mixed/multilingual
  *    crawls; downstream quality scores (stopword ratio) consume it.
  *  - `text_lm_holdout_ppl` is held-out cross-entropy of an add-one
  *    bigram LM: train on even doc_ids, score odd ones — the standard
  *    quality signal CCNet/Gopher attach to every document, done
  *    honestly with a train/test split so memorized text can't score
  *    itself. Log-probs accumulate as 1e9-scaled integers (associative,
  *    order-immune) per the house float policy.
  *  - `data_class_weights` computes inverse-frequency class weights
  *    w = N/(k·n_c) per (lang) stratum plus each stratum's effective
  *    sample share — what a trainer multiplies into the loss to
  *    rebalance skewed corpora. One aggregate; broadcastable output.
  */
object Wave38Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "data_profile_table",
      (s, dir) => {
        val o = T(s, dir, "orders")
        // single pass: every column's aggregates in ONE hash aggregate;
        // canonical renderings (int/date/cent strings) match DuckDB's
        def prof(colName: String, canon: org.apache.spark.sql.Column)
            : org.apache.spark.sql.Column =
          struct(
            lit(colName).as("column"),
            dround(count(col(colName)).cast("double") /
              count(lit(1)), 6).as("completeness"),
            countDistinct(col(colName)).as("n_distinct"),
            // aggregate in the column's OWN order, cast the RESULT —
            // min over strings would compare lexicographically
            min(canon).cast("string").as("min_val"),
            max(canon).cast("string").as("max_val"))
        val row = o.agg(
          prof("o_orderkey", col("o_orderkey")).as("c1"),
          prof("o_custkey", col("o_custkey")).as("c2"),
          prof("o_orderstatus", col("o_orderstatus")).as("c3"),
          prof("o_totalprice",
            round(col("o_totalprice") * 100).cast("long")).as("c4"),
          prof("o_orderdate", col("o_orderdate").cast("date")).as("c5"),
          prof("o_orderpriority", col("o_orderpriority")).as("c6"))
        // one row per column: explode the struct array (6 rows total)
        row.select(explode(array(row.columns.map(col): _*)).as("p"))
          .select(col("p.column").as("column"),
            col("p.completeness").as("completeness"),
            col("p.n_distinct").as("n_distinct"),
            col("p.min_val").as("min_val"),
            col("p.max_val").as("max_val"))
          .orderBy("column")
      },
      Some(
        "WITH p AS (" +
          "SELECT 'o_orderkey' AS \"column\", " +
          "round(CAST(count(o_orderkey) AS DOUBLE) / count(*) * 1e6) / 1e6 " +
          "AS completeness, CAST(count(DISTINCT o_orderkey) AS BIGINT) " +
          "AS n_distinct, CAST(min(o_orderkey) AS VARCHAR) AS min_val, " +
          "CAST(max(o_orderkey) AS VARCHAR) AS max_val FROM orders " +
          "UNION ALL SELECT 'o_custkey', " +
          "round(CAST(count(o_custkey) AS DOUBLE) / count(*) * 1e6) / 1e6, " +
          "CAST(count(DISTINCT o_custkey) AS BIGINT), " +
          "CAST(min(o_custkey) AS VARCHAR), " +
          "CAST(max(o_custkey) AS VARCHAR) FROM orders " +
          "UNION ALL SELECT 'o_orderstatus', " +
          "round(CAST(count(o_orderstatus) AS DOUBLE) / count(*) * 1e6) / 1e6, " +
          "CAST(count(DISTINCT o_orderstatus) AS BIGINT), " +
          "min(o_orderstatus), max(o_orderstatus) FROM orders " +
          "UNION ALL SELECT 'o_totalprice', " +
          "round(CAST(count(o_totalprice) AS DOUBLE) / count(*) * 1e6) / 1e6, " +
          "CAST(count(DISTINCT o_totalprice) AS BIGINT), " +
          "CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR), " +
          "CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR) " +
          "FROM orders " +
          "UNION ALL SELECT 'o_orderdate', " +
          "round(CAST(count(o_orderdate) AS DOUBLE) / count(*) * 1e6) / 1e6, " +
          "CAST(count(DISTINCT o_orderdate) AS BIGINT), " +
          "CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR), " +
          "CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) FROM orders " +
          "UNION ALL SELECT 'o_orderpriority', " +
          "round(CAST(count(o_orderpriority) AS DOUBLE) / count(*) * 1e6) / 1e6, " +
          "CAST(count(DISTINCT o_orderpriority) AS BIGINT), " +
          "min(o_orderpriority), max(o_orderpriority) FROM orders) " +
          "SELECT * FROM p ORDER BY \"column\"")
    ),
    Q(
      "text_stopword_detect",
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val nd = docs.groupBy("lang").agg(count(lit(1)).as("nd"))
        val df = docs
          .select(col("doc_id"), col("lang"),
            explode(array_distinct(split(col("text"), " "))).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("df"))
        df.join(broadcast(nd), "lang")
          .withColumn("df_pct",
            dround(col("df").cast("double") * 100 / col("nd"), 4))
          .filter(col("df") * lit(100) > col("nd") * lit(40)) // exact-int
          .select("lang", "tok", "df", "df_pct")
          .orderBy(col("lang"), col("df").desc, col("tok"))
      },
      Some(
        "WITH nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd " +
          "FROM documents GROUP BY lang), " +
          "toks AS (SELECT DISTINCT doc_id, lang, " +
          "unnest(string_split(text, ' ')) AS tok FROM documents), " +
          "df AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS df " +
          "FROM toks GROUP BY 1, 2) " +
          "SELECT df.lang, tok, df, " +
          droundSql("CAST(df AS DOUBLE) * 100 / nd", 4) + " AS df_pct " +
          "FROM df JOIN nd ON df.lang = nd.lang " +
          "WHERE df * 100 > nd * 40 " +
          "ORDER BY df.lang, df DESC, tok")
    ),
    Q(
      "text_lm_holdout_ppl",
      (s, dir) => {
        val docs = T(s, dir, "documents")
        def bigrams(d: DataFrame): DataFrame = d
          .select(col("doc_id"), col("lang"),
            split(col("text"), " ").as("tk"))
          .select(col("doc_id"), col("lang"), explode(expr(
            "filter(zip_with(tk, slice(tk, 2, size(tk)), " +
              "(a, b) -> named_struct('w1', a, 'w2', b)), " +
              "x -> x.w2 IS NOT NULL)")).as("bg"))
          .select(col("doc_id"), col("lang"),
            col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        val train = bigrams(docs.filter(col("doc_id") % 2 === 0))
        val test = bigrams(docs.filter(col("doc_id") % 2 === 1))
        // add-one bigram LM: P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V)
        val cBg = train.groupBy("lang", "w1", "w2")
          .agg(count(lit(1)).as("cbg"))
        val cW1 = train.groupBy("lang", "w1")
          .agg(count(lit(1)).as("cw1"))
        val vocab = train.select("lang", "w2").distinct()
          .groupBy("lang").agg(count(lit(1)).as("v"))
        // held-out tokens score against the TRAIN counts (0 when
        // unseen); log-probs accumulate as 1e9-scaled ints
        test
          .join(cBg, Seq("lang", "w1", "w2"), "left")
          .join(cW1, Seq("lang", "w1"), "left")
          .join(broadcast(vocab), Seq("lang"))
          .withColumn("lp", round(
            log((coalesce(col("cbg"), lit(0L)) + lit(1)).cast("double") /
              (coalesce(col("cw1"), lit(0L)) + col("v"))) * 1e9)
            .cast("long"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_bigrams"),
            dround((-sum("lp")).cast("double") / count(lit(1)) / 1e9, 6)
              .as("cross_entropy_nats"))
          .orderBy("lang")
      },
      Some(
        "WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS tk " +
          "FROM documents), " +
          "bg AS (SELECT doc_id, lang, unnest(list_transform(" +
          "range(1, len(tk)), i -> {'w1': tk[i], 'w2': tk[i+1]})) AS b " +
          "FROM tk), " +
          "bgf AS (SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM bg), " +
          "train AS (SELECT * FROM bgf WHERE doc_id % 2 = 0), " +
          "test AS (SELECT * FROM bgf WHERE doc_id % 2 = 1), " +
          "cbg AS (SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS cbg " +
          "FROM train GROUP BY 1, 2, 3), " +
          "cw1 AS (SELECT lang, w1, CAST(count(*) AS BIGINT) AS cw1 " +
          "FROM train GROUP BY 1, 2), " +
          "vocab AS (SELECT lang, CAST(count(DISTINCT w2) AS BIGINT) AS v " +
          "FROM train GROUP BY 1), " +
          "sc AS (SELECT t.lang, CAST(round(ln(" +
          "CAST(coalesce(cbg.cbg, 0) + 1 AS DOUBLE) / " +
          "(coalesce(cw1.cw1, 0) + vocab.v)) * 1e9) AS BIGINT) AS lp " +
          "FROM test t " +
          "LEFT JOIN cbg ON t.lang = cbg.lang AND t.w1 = cbg.w1 " +
          "AND t.w2 = cbg.w2 " +
          "LEFT JOIN cw1 ON t.lang = cw1.lang AND t.w1 = cw1.w1 " +
          "JOIN vocab ON t.lang = vocab.lang) " +
          "SELECT lang, CAST(count(*) AS BIGINT) AS n_bigrams, " +
          droundSql("CAST(-sum(lp) AS DOUBLE) / count(*) / 1e9", 6) +
          " AS cross_entropy_nats FROM sc GROUP BY lang ORDER BY lang")
    ),
    Q(
      "data_class_weights",
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val per = docs.groupBy("lang", "source")
          .agg(count(lit(1)).as("n"))
        val tot = per.agg(sum("n").as("total"),
          count(lit(1)).as("k"))
        per.crossJoin(broadcast(tot))
          .select(col("lang"), col("source"), col("n"),
            // inverse-frequency weight: w = N / (k * n_c)
            dround(col("total").cast("double") /
              (col("k") * col("n")), 6).as("weight"),
            dround(col("n").cast("double") * 100 / col("total"), 4)
              .as("share_pct"))
          .orderBy("lang", "source")
      },
      Some(
        "WITH per AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n " +
          "FROM documents GROUP BY 1, 2), " +
          "tot AS (SELECT CAST(sum(n) AS BIGINT) AS total, " +
          "CAST(count(*) AS BIGINT) AS k FROM per) " +
          "SELECT lang, source, n, " +
          droundSql("CAST(total AS DOUBLE) / (k * n)", 6) + " AS weight, " +
          droundSql("CAST(n AS DOUBLE) * 100 / total", 4) + " AS share_pct " +
          "FROM per, tot ORDER BY lang, source")
    )
  )
}
