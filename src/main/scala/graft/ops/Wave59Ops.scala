package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 wave 59: lexical retrieval SERVING and variable-length
  * exact-substring dedup — the two text gaps VERDICT-r10 ranked highest
  * (#4/#5 of "next round").
  *
  *  - `text_bm25_topk` is the query→documents serving path on top of
  *    text_bm25's corpus statistics (the lexical sibling of
  *    vec_knn_query): a BATCH of queries (broadcast — the query set is
  *    the small side by construction) scored with Okapi BM25 (k1=1.2,
  *    b=0.75) against the corpus DF/IDF stats, top-k per query by
  *    (score, doc_id) — a total order. Only postings of query terms
  *    ever shuffle (the term filter runs before the tf aggregation);
  *    df and the corpus stats broadcast; the per-query top-k window
  *    partitions by q_id over only the scored candidates. At 100 TB
  *    the DF/IDF table is built once (text_tfidf's machinery) and each
  *    query batch touches only its postings — the inverted-index scan
  *    shape without materializing an index.
  *  - `text_dup_runs` is variable-length exact-substring duplicate
  *    detection (the published training-data dedup modality next to
  *    text_dup_spans' fixed 8-token coverage): maximal cross-document
  *    runs of consecutive duplicated 8-token shingles, coalesced per
  *    (doc pair, position diagonal) with a gaps-and-islands window —
  *    a run of length L shingles certifies an exact duplicated
  *    substring of L+7 tokens, and MAXIMAL runs come out directly (no
  *    suffix array materialized). Cost: one shingle self-join bounded
  *    by shingle frequency (boilerplate shingles — the hot keys — are
  *    cut at 100 occurrences, the standard mitigation) plus one
  *    window over matched diagonals, linear in matching positions.
  *  - `text_bpe_train` LEARNS a BPE merge table distributedly (VERDICT
  *    #6; `text_token_bpe` only applies one): 6 merge rounds, each ONE
  *    pair-count aggregate over the word-count table (weighted by word
  *    frequency — the corpus itself is touched once, for the vocab) +
  *    a driver-side argmax (count desc, then lexicographic — a total
  *    order) + a broadcast-applied merge. Merge application is one
  *    left-to-right non-overlapping replacement pass per round,
  *    IDENTICAL in Spark/DuckDB `replace` and the spec's in-memory
  *    reference trainer (a run of repeated pairs — 'aaaa' — merges one
  *    pair per pass instead of greedily all; consecutive rounds pick
  *    up the rest iff the pair stays on top: the one documented
  *    deviation from canonical greedy BPE). At 100 TB the vocab table
  *    is the only shuffled state (~1e7 rows) and each round is one
  *    map-side-combined aggregate — the "train in k shuffles" shape of
  *    ml_logreg_irls applied to tokenizer learning.
  */
object Wave59Ops extends QueryModule {

  /** The fixed query batch (q_id, term) for text_bm25_topk (and the
    * lexical half of hybrid_rrf_serve — Wave61). */
  private[ops] val QuerySet: Seq[(Long, String)] = Seq(
    1L -> "hash", 1L -> "join", 1L -> "scan",
    2L -> "stream", 2L -> "window", 2L -> "batch",
    3L -> "sort", 3L -> "merge", 3L -> "filter",
    4L -> "vector", 4L -> "query")

  /** BPE merge rounds for text_bpe_train (unrolled in the oracle). */
  val BpeRounds = 6

  /** The BM25 oracle CTE chain, name-prefixed so the consumers —
    * text_bm25_topk / stream_bm25_index (p = "", ranked CTE `r`) and
    * the hybrid serving oracles (p = "l"/per-pin prefixes) — share ONE
    * definition of the scoring arithmetic instead of drift-prone
    * copies. The final CTE `${p}r` carries (q_id, doc_id, bm25,
    * n_terms, rnk). `docWhere` restricts the corpus — the incremental
    * serving oracle replays a pin that has absorbed only some waves. */
  private[ops] def bm25CteChain(p: String,
      docWhere: String = "TRUE"): String = {
    val values = QuerySet
      .map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }
      .mkString(", ")
    s"${p}q AS (SELECT q_id, tok FROM (VALUES " + values +
      ") AS t(q_id, tok)), " +
      s"${p}tk AS (SELECT doc_id, " +
      "unnest(string_split(text, ' ')) AS tok FROM documents " +
      s"WHERE $docWhere), " +
      s"${p}tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf " +
      s"FROM ${p}tk WHERE tok IN (SELECT DISTINCT tok FROM ${p}q) " +
      "GROUP BY 1, 2), " +
      s"${p}dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df " +
      s"FROM ${p}tf GROUP BY 1), " +
      s"${p}dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) " +
      s"AS BIGINT) AS dl FROM documents WHERE $docWhere), " +
      s"${p}st AS (SELECT CAST(count(*) AS BIGINT) AS nd, " +
      s"CAST(sum(dl) AS BIGINT) AS sdl FROM ${p}dl), " +
      s"${p}w AS (SELECT ${p}q.q_id, ${p}tf.doc_id, " +
      "ln((CAST(nd AS DOUBLE) - df + 0.5) / " +
      "(CAST(df AS DOUBLE) + 0.5) + 1.0) * " +
      "(CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + " +
      "1.2 * (1.0 - 0.75 + 0.75 * dl / " +
      "(CAST(sdl AS DOUBLE) / nd))) AS w " +
      s"FROM ${p}tf JOIN ${p}dfq USING (tok) JOIN ${p}q USING (tok) " +
      s"JOIN ${p}dl ON ${p}tf.doc_id = ${p}dl.doc_id, ${p}st), " +
      s"${p}sc AS (SELECT q_id, doc_id, " + droundSql("sum(w)", 6) +
      s" AS bm25, CAST(count(*) AS BIGINT) AS n_terms FROM ${p}w " +
      "GROUP BY 1, 2), " +
      s"${p}r AS (SELECT q_id, doc_id, bm25, n_terms, " +
      "CAST(row_number() OVER (PARTITION BY q_id " +
      s"ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rnk FROM ${p}sc)"
  }

  /** The text_bm25_topk oracle — shared verbatim by stream_bm25_index
    * and table_txn_compact (Wave63): after the index absorbs every
    * wave it must serve exactly what the from-scratch ranker serves
    * over the same corpus. */
  private[ops] val bm25TopkOracle: String =
    "WITH " + bm25CteChain("") +
      " SELECT q_id, rnk, doc_id, bm25, n_terms FROM r " +
      "WHERE rnk <= 5 ORDER BY q_id, rnk"

  /** English docs with >= 8 tokens: `(doc_id, toks)` — the corpus slice
    * the exact-substring family runs on. */
  private[ops] def enTokenDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    T(s, dir, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)

  /** Maximal cross-document duplicated runs `(doc_a, doc_b, a_start,
    * b_start, n_tokens)`: positioned 8-token shingles, boilerplate cut
    * at 100 occurrences, cross-doc matches coalesced per (pair,
    * position diagonal) by a gaps-and-islands window. ONE definition —
    * text_dup_runs reports the runs, text_dup_coverage (Wave60)
    * interval-unions them per document; the shingle width / cut /
    * island logic cannot drift apart. */
  private[ops] def dupRuns(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val sh = enTokenDocs(s, dir).select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 7), " +
          "i -> struct(i AS pos, array_join(slice(toks, i, 8), ' ') " +
          "AS sh))")).as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"), col("e.sh").as("sh"))
    // boilerplate cut: a shingle occurring > 100 times is navigation/
    // template noise whose match set explodes quadratically — the
    // standard exact-substring-dedup mitigation, applied identically
    // in the oracle
    val perSh = Window.partitionBy("sh")
    val bounded = sh.withColumn("occ", count(lit(1)).over(perSh))
      .filter(col("occ") <= 100)
      .drop("occ")
    // cross-document matches on one position diagonal form runs
    val m = bounded.as("a").join(bounded.as("b"),
        col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"),
        (col("b.pos") - col("a.pos")).as("diag"))
    // gaps-and-islands over pa within (pair, diagonal): consecutive
    // matched positions coalesce into one MAXIMAL run
    val wd = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    m.withColumn("isl", col("pa") - row_number().over(wd))
      .groupBy("doc_a", "doc_b", "diag", "isl")
      .agg(min("pa").cast("long").as("a_start"),
        min("pb").cast("long").as("b_start"),
        (count(lit(1)) + 7).as("n_tokens"))
      .select("doc_a", "doc_b", "a_start", "b_start", "n_tokens")
  }

  /** Okapi-BM25 batch serving: the QuerySet scored against the corpus
    * DF/IDF stats, top-5 per query by (score, doc_id) — the body of
    * `text_bm25_topk`, factored so hybrid_rrf_serve (Wave61) fuses the
    * SAME lexical ranker instead of a drift-prone copy. Returns
    * `(q_id, rnk, doc_id, bm25, n_terms)` ordered by (q_id, rnk). */
  private[ops] def bm25TopK(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val qterms = QuerySet.map(_._2).distinct
    // only query-term postings move into the tf shuffle
    val toks = T(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isin(qterms: _*))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val dl = T(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " "))
        .cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"), sum("dl").as("sdl"))
    bm25Serve(s, tf, dfq, dl, stats)
  }

  /** The Okapi scoring + per-query top-5, factored over its four input
    * frames — `tf (doc_id, tok, tf)`, `dfq (tok, df)`, `dl (doc_id,
    * dl)`, `stats (nd, sdl)` one row — so the from-scratch serving path
    * (text_bm25_topk) and the pinned-index serving path
    * (stream_bm25_index, Wave63) score with ONE body and cannot drift.
    * Returns `(q_id, rnk, doc_id, bm25, n_terms)` ordered. */
  private[ops] def bm25Serve(s: org.apache.spark.sql.SparkSession,
      tf: org.apache.spark.sql.DataFrame,
      dfq: org.apache.spark.sql.DataFrame,
      dl: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val k1 = 1.2; val b = 0.75
    val qdf = QuerySet.toDF("q_id", "tok")
    val scored = tf.join(broadcast(dfq), Seq("tok"))
      .join(broadcast(qdf), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sdl").cast("double") / col("nd"))
      .withColumn("idf", log(
        (col("nd").cast("double") - col("df") + 0.5) /
          (col("df").cast("double") + 0.5) + 1.0))
      // lit(2.2), NOT k1 + 1.0: the runtime sum 1.2+1.0 is one ulp
      // BELOW the parsed literal 2.2 the oracle uses (text_bm25)
      .withColumn("w", col("idf") *
        (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") /
            col("avgdl"))))
      .groupBy("q_id", "doc_id")
      .agg(dround(sum("w"), 6).as("bm25"),
        count(lit(1)).as("n_terms"))
    val wr = Window.partitionBy("q_id")
      .orderBy(col("bm25").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(wr).cast("long"))
      .filter(col("rnk") <= 5)
      .select("q_id", "rnk", "doc_id", "bm25", "n_terms")
      .orderBy("q_id", "rnk")
  }

  def queries: Seq[Q] = Seq(
    Q(
      "text_bm25_topk",
      (s, dir) => bm25TopK(s, dir),
      Some(bm25TopkOracle)
    ),
    Q(
      "text_dup_runs",
      (s, dir) =>
        dupRuns(s, dir).orderBy("doc_a", "doc_b", "a_start", "b_start"),
      Some(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks " +
          "FROM documents WHERE lang = 'en'), " +
          "f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8), " +
          "sh0 AS (SELECT doc_id, unnest(generate_series(1, " +
          "len(toks) - 7)) AS pos, toks FROM f), " +
          "sh AS (SELECT doc_id, pos, " +
          "array_to_string(toks[pos:pos+7], ' ') AS sh FROM sh0), " +
          "bd AS (SELECT doc_id, pos, sh FROM (SELECT doc_id, pos, sh, " +
          "count(*) OVER (PARTITION BY sh) AS occ FROM sh) " +
          "WHERE occ <= 100), " +
          "m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
          "a.pos AS pa, b.pos AS pb, b.pos - a.pos AS diag " +
          "FROM bd a JOIN bd b ON a.sh = b.sh AND a.doc_id < b.doc_id), " +
          "r AS (SELECT doc_a, doc_b, pa, pb, diag, " +
          "pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag " +
          "ORDER BY pa) AS isl FROM m) " +
          "SELECT doc_a, doc_b, CAST(min(pa) AS BIGINT) AS a_start, " +
          "CAST(min(pb) AS BIGINT) AS b_start, " +
          "CAST(count(*) + 7 AS BIGINT) AS n_tokens " +
          "FROM r GROUP BY doc_a, doc_b, diag, isl " +
          "ORDER BY doc_a, doc_b, a_start, b_start")
    ),
    Q(
      "text_bpe_train",
      (s, dir) => {
        val words = T(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word").rlike("^[a-z]+$"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .withColumn("sym", concat(lit(" "),
            array_join(expr("regexp_extract_all(word, '.', 0)"), " "),
            lit(" ")))
          .select("cnt", "sym")
          .persist()
        try {
          var cur = words
          val learned = Seq.newBuilder[(Long, String, String, Long, Long)]
          for (r <- 1 to BpeRounds) {
            // ONE aggregate of frequency-weighted adjacent-pair counts
            val top = cur
              .withColumn("syms", split(trim(col("sym")), " "))
              .filter(size(col("syms")) >= 2)
              .select(col("cnt"), explode(expr(
                "transform(sequence(1, size(syms) - 1), " +
                  "i -> struct(element_at(syms, i) AS s1, " +
                  "element_at(syms, i + 1) AS s2))")).as("p"))
              .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
              .agg(sum("cnt").as("c"))
              .orderBy(col("c").desc, col("s1"), col("s2"))
              .limit(1).collect()(0)
            val (s1, s2, c) =
              (top.getString(0), top.getString(1), top.getLong(2))
            // broadcast-applied merge: symbols are [a-z]+ by the vocab
            // filter, so inlining them into the expression is safe
            cur = cur.withColumn("sym",
              expr(s"replace(sym, ' $s1 $s2 ', ' $s1$s2 ')"))
            val tokensAfter = cur
              .agg(sum(col("cnt") *
                size(split(trim(col("sym")), " "))).cast("long"))
              .collect()(0).getLong(0)
            learned += ((r.toLong, s1, s2, c, tokensAfter))
          }
          import s.implicits._
          learned.result()
            .toDF("merge_round", "s1", "s2", "pair_count", "tokens_after")
            .orderBy("merge_round")
        } finally words.unpersist(blocking = false)
      },
      Some {
        val base = "WITH w0 AS MATERIALIZED (SELECT cnt, " +
          "' ' || array_to_string(regexp_extract_all(word, '.'), ' ') " +
          "|| ' ' AS sym FROM (SELECT word, " +
          "CAST(count(*) AS BIGINT) AS cnt FROM (SELECT " +
          "unnest(string_split(text, ' ')) AS word FROM documents) " +
          "WHERE regexp_matches(word, '^[a-z]+$') GROUP BY 1)), "
        def round(r: Int): String = {
          val prev = s"w${r - 1}"
          s"p$r AS (SELECT s1, s2, CAST(sum(cnt) AS BIGINT) AS c FROM (" +
            "SELECT cnt, syms[i] AS s1, syms[i + 1] AS s2 FROM (" +
            s"SELECT cnt, string_split(trim(sym), ' ') AS syms " +
            s"FROM $prev), " +
            "UNNEST(generate_series(1, len(syms) - 1)) AS u(i)) " +
            "GROUP BY 1, 2), " +
            s"m$r AS (SELECT s1, s2, c FROM p$r " +
            "ORDER BY c DESC, s1, s2 LIMIT 1), " +
            s"w$r AS MATERIALIZED (SELECT cnt, replace(sym, " +
            "' ' || s1 || ' ' || s2 || ' ', ' ' || s1 || s2 || ' ') " +
            s"AS sym FROM $prev, m$r), " +
            s"t$r AS (SELECT CAST(sum(cnt * " +
            "len(string_split(trim(sym), ' '))) AS BIGINT) " +
            s"AS tokens_after FROM w$r)"
        }
        base + (1 to BpeRounds).map(round).mkString(", ") + " " +
          "SELECT * FROM (" +
          (1 to BpeRounds).map(r =>
            s"SELECT CAST($r AS BIGINT) AS merge_round, s1, s2, " +
              s"c AS pair_count, tokens_after FROM m$r, t$r")
            .mkString(" UNION ALL ") +
          ") ORDER BY merge_round"
      }
    ),
    Q(
      "vec_ivf_recall_sweep",
      // ANN EVAL for the IVF family this repo serves with ("measure,
      // don't guess" applied to recall): for nprobe = 1..4, the IVF
      // probe's top-5 per query vs the exact top-5, recall@5 per
      // (nprobe, query). Deterministic end-to-end (integer-grid
      // geometry, 1e-9-rounded cosine, ties to lowest id), so DuckDB
      // replays routing + both rankings + the hit join. The exact side
      // is the eval's ground truth over a BOUNDED 3-query set — q×n
      // rows, the cost every recall eval pays by definition, not a
      // corpus-squared term.
      (s, dir) => {
        import s.implicits._
        val gridded = T(s, dir, "embeddings")
          .select(col("vec_id"), expr(
            "transform(embedding, x -> " +
              "CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT))").as("g"))
        val k = graft.vec.VecAlgs
          .cellCount(T.rows(s, dir, "embeddings"))
        val cents = gridded.filter(col("vec_id") < k)
          .select(col("vec_id").as("cid"), col("g").as("cg"))
        val cells = graft.vec.IvfRouting.assignCoarse(gridded, cents)
        val n2 = (a: String) => expr(
          s"aggregate($a, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")
        val qs = gridded.filter(col("vec_id").isin(5L, 17L, 42L))
          .select(col("vec_id").as("q_id"), col("g").as("qg"))
          .withColumn("qn2", n2("qg")).filter(col("qn2") > 0)
        // per-(query, cell) centroid rank — the probe order
        val wc = Window.partitionBy("q_id")
          .orderBy(col("cd2"), col("cid"))
        val crank = qs.crossJoin(broadcast(cents))
          .withColumn("cd2", graft.vec.IvfRouting.d2("qg", "cg"))
          .select(col("q_id"), col("cid").as("cell"),
            row_number().over(wc).cast("long").as("crank"))
        // all (query, candidate) sims once; both rankings read it
        val sims = cells.join(broadcast(qs), col("vec_id") =!= col("q_id"))
          .withColumn("nn", n2("g")).filter(col("nn") > 0)
          .withColumn("dot", expr(
            "aggregate(zip_with(g, qg, (a, b) -> a * b), " +
              "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
          .withColumn("sim", round(col("dot") /
            sqrt(col("nn").cast("double") * col("qn2").cast("double"))
            * 1e9) / 1e9)
          .select("q_id", "vec_id", "cell", "sim")
        val we = Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("vec_id"))
        val exact5 = sims
          .withColumn("rk", row_number().over(we))
          .filter(col("rk") <= 5).select("q_id", "vec_id")
        val probes = (1 to 4).toSeq
        val wi = Window.partitionBy("q_id", "nprobe")
          .orderBy(col("sim").desc, col("vec_id"))
        val ivf5 = sims.join(crank, Seq("q_id", "cell"))
          .crossJoin(broadcast(
            probes.toDF("nprobe").select(col("nprobe").cast("long")
              .as("nprobe"))))
          .filter(col("crank") <= col("nprobe"))
          .withColumn("rk", row_number().over(wi))
          .filter(col("rk") <= 5)
          .select("nprobe", "q_id", "vec_id")
        ivf5.join(exact5.withColumn("hit", lit(1L)),
            Seq("q_id", "vec_id"), "left")
          .groupBy("nprobe", "q_id")
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .select(col("nprobe"), col("q_id"), col("n_hits"),
            round(col("n_hits") / lit(5.0) * 1e6).cast("long")
              .divide(lit(1e6)).as("recall5"))
          .orderBy("nprobe", "q_id")
      },
      Some(
        "WITH g AS (SELECT vec_id, list_transform(embedding, " +
          "x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS g " +
          "FROM embeddings), " +
          "c AS (SELECT vec_id AS cid, g AS cg FROM g WHERE vec_id < " +
          "LEAST(65536, GREATEST(1, CAST(ceil(sqrt((" +
          "SELECT count(*) FROM embeddings))) AS BIGINT)))), " +
          "cells AS (SELECT vec_id, g, " +
          "(SELECT cid FROM c ORDER BY list_sum(list_transform(" +
          "list_zip(g.g, c.cg), p -> (p[1] - p[2]) * (p[1] - p[2]))), " +
          "cid LIMIT 1) AS cell FROM g), " +
          "q AS (SELECT vec_id AS q_id, g AS qg, " +
          "list_sum(list_transform(g, x -> x * x)) AS qn2 FROM g " +
          "WHERE vec_id IN (5, 17, 42) " +
          "AND list_sum(list_transform(g, x -> x * x)) > 0), " +
          "crank AS (SELECT q_id, cid AS cell, " +
          "CAST(row_number() OVER (PARTITION BY q_id ORDER BY " +
          "list_sum(list_transform(list_zip(qg, cg), " +
          "p -> (p[1] - p[2]) * (p[1] - p[2]))), cid) AS BIGINT) " +
          "AS crank FROM q, c), " +
          "sims AS (SELECT q.q_id, cells.vec_id, cells.cell, " +
          "round(list_sum(list_transform(list_zip(cells.g, q.qg), " +
          "p -> p[1] * p[2])) / sqrt(CAST(list_sum(list_transform(" +
          "cells.g, x -> x * x)) AS DOUBLE) * CAST(q.qn2 AS DOUBLE)) " +
          "* 1e9) / 1e9 AS sim " +
          "FROM cells, q WHERE cells.vec_id <> q.q_id " +
          "AND list_sum(list_transform(cells.g, x -> x * x)) > 0), " +
          "exact5 AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id, " +
          "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, " +
          "vec_id) AS rk FROM sims) WHERE rk <= 5), " +
          "pr AS (SELECT CAST(unnest(generate_series(1, 4)) AS BIGINT) " +
          "AS nprobe), " +
          "ivf5 AS (SELECT nprobe, q_id, vec_id FROM (" +
          "SELECT pr.nprobe, s.q_id, s.vec_id, " +
          "row_number() OVER (PARTITION BY s.q_id, pr.nprobe " +
          "ORDER BY s.sim DESC, s.vec_id) AS rk " +
          "FROM sims s JOIN crank k ON s.q_id = k.q_id " +
          "AND s.cell = k.cell, pr WHERE k.crank <= pr.nprobe) " +
          "WHERE rk <= 5) " +
          "SELECT i.nprobe, i.q_id, " +
          "CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS n_hits, " +
          "CAST(round(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 " +
          "END) / 5.0 * 1e6) AS BIGINT) / 1e6 AS recall5 " +
          "FROM ivf5 i LEFT JOIN exact5 e ON i.q_id = e.q_id " +
          "AND i.vec_id = e.vec_id " +
          "GROUP BY i.nprobe, i.q_id ORDER BY i.nprobe, i.q_id")
    )
  )
}
