package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 40: retrieval scoring + experiment/survival analysis.
  *
  *  - `text_bm25` is Okapi BM25 (k1=1.2, b=0.75) over the documents
  *    corpus for a fixed 3-term query — the lexical-retrieval
  *    baseline every RAG pipeline starts from. The term filter runs
  *    BEFORE the tf shuffle (only query-term postings move), df and
  *    the corpus stats broadcast, and doc length comes from a second
  *    column-pruned scan — no global state beyond two tiny frames.
  *  - `text_pmi_collocations` ranks adjacent-bigram collocations by
  *    pointwise mutual information: posexplode → co-partitioned
  *    self-join on (doc, pos+1) → two count aggregates. All counts
  *    are exact integers; the PMI log combines them in double only
  *    at the end (int64 products would overflow at corpus scale).
  *  - `vec_rrf_fusion` fuses two cosine rankers (queries vec_id 0
  *    and 1) with reciprocal-rank fusion (k=60) — the standard
  *    hybrid-retrieval merge. Contract: each ranker contributes its
  *    top-100 list (a bounded TakeOrdered, never a global window
  *    over the table); absent-from-one-list candidates simply get no
  *    contribution from that ranker, per the usual RRF practice.
  *  - `stats_diff_in_diff` is the 2x2 difference-in-differences
  *    estimator on purchase value (treatment = user hash parity,
  *    period split at the observation midpoint) with the pooled
  *    delta-method SE — per-cell cent-integer sums keep the means
  *    deterministic, doubles enter only for the variance combine.
  *  - `stats_kaplan_meier` is the product-limit survival estimator
  *    for time-to-first-purchase after first view (right-censored at
  *    the observation end). The cumulative product runs as
  *    exp(cumsum(ln ·)) over a calendar-bounded day series (≤ horizon
  *    days — same bounded-window argument as win_bollinger_bands).
  */
object Wave40Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "text_bm25",
      (s, dir) => {
        val qterms = Seq("hash", "join", "scan")
        val k1 = 1.2; val b = 0.75
        val toks = T(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok").isin(qterms: _*))
        val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val dl = T(s, dir, "documents")
          .select(col("doc_id"), size(split(col("text"), " "))
            .cast("long").as("dl"))
        val stats = dl.agg(count(lit(1)).as("nd"), sum("dl").as("sdl"))
        tf.join(broadcast(dfq), Seq("tok"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .withColumn("avgdl", col("sdl").cast("double") / col("nd"))
          .withColumn("idf", log(
            (col("nd").cast("double") - col("df") + 0.5) /
              (col("df").cast("double") + 0.5) + 1.0))
          // lit(2.2), NOT k1 + 1.0: the runtime sum 1.2+1.0 is one ulp
          // BELOW the parsed literal 2.2 the oracle uses
          .withColumn("w", col("idf") *
            (col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") +
              lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") /
                col("avgdl"))))
          .groupBy("doc_id")
          .agg(dround(sum("w"), 6).as("bm25"),
            count(lit(1)).as("n_terms"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(10)
      },
      Some(
        "WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok " +
          "FROM documents), " +
          "tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf " +
          "FROM tk WHERE tok IN ('hash', 'join', 'scan') GROUP BY 1, 2), " +
          "dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf " +
          "GROUP BY 1), " +
          "dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) " +
          "AS BIGINT) AS dl FROM documents), " +
          "st AS (SELECT CAST(count(*) AS BIGINT) AS nd, " +
          "CAST(sum(dl) AS BIGINT) AS sdl FROM dl), " +
          "w AS (SELECT tf.doc_id, " +
          "ln((CAST(nd AS DOUBLE) - df + 0.5) / " +
          "(CAST(df AS DOUBLE) + 0.5) + 1.0) * " +
          "(CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + " +
          "1.2 * (1.0 - 0.75 + 0.75 * dl / " +
          "(CAST(sdl AS DOUBLE) / nd))) AS w " +
          "FROM tf JOIN dfq USING (tok) JOIN dl ON tf.doc_id = dl.doc_id, " +
          "st) " +
          "SELECT doc_id, " + droundSql("sum(w)", 6) + " AS bm25, " +
          "CAST(count(*) AS BIGINT) AS n_terms FROM w GROUP BY doc_id " +
          "ORDER BY bm25 DESC, doc_id LIMIT 10")
    ),
    Q(
      "text_pmi_collocations",
      (s, dir) => {
        val pos = T(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " "))
            .as(Seq("pos", "tok")))
        val bi = pos.as("l")
          .join(pos.as("r"),
            col("l.doc_id") === col("r.doc_id") &&
              col("l.pos") + 1 === col("r.pos"))
          .select(col("l.tok").as("a"), col("r.tok").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
        val uni = pos.groupBy("tok").agg(count(lit(1)).as("c"))
        val totB = bi.agg(sum("c_ab").as("tb"))
        val totU = uni.agg(sum("c").as("tu"))
        bi.filter(col("c_ab") >= 5)
          .join(broadcast(uni.select(col("tok").as("a"),
            col("c").as("c_a"))), Seq("a"))
          .join(broadcast(uni.select(col("tok").as("b"),
            col("c").as("c_b"))), Seq("b"))
          .crossJoin(broadcast(totB)).crossJoin(broadcast(totU))
          // PMI in double: c_ab·U² overflows int64 at corpus scale
          .withColumn("pmi", dround(log(
            col("c_ab").cast("double") * col("tu") * col("tu") /
              (col("tb").cast("double") * col("c_a") * col("c_b"))), 6))
          .select("a", "b", "c_ab", "pmi")
          .orderBy(col("pmi").desc, col("a"), col("b"))
          .limit(15)
      },
      Some(
        "WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok, " +
          "unnest(generate_series(1, len(string_split(text, ' ')))) AS pos " +
          "FROM documents), " +
          "bi AS (SELECT l.tok AS a, r.tok AS b, " +
          "CAST(count(*) AS BIGINT) AS c_ab FROM tk l JOIN tk r " +
          "ON l.doc_id = r.doc_id AND l.pos + 1 = r.pos GROUP BY 1, 2), " +
          "uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk " +
          "GROUP BY 1), " +
          "tb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS tb FROM bi), " +
          "tu AS (SELECT CAST(sum(c) AS BIGINT) AS tu FROM uni) " +
          "SELECT a, b, c_ab, " +
          droundSql("ln(CAST(c_ab AS DOUBLE) * tu * tu / " +
            "(CAST(tb AS DOUBLE) * ua.c * ub.c))", 6) + " AS pmi " +
          "FROM bi JOIN uni ua ON bi.a = ua.tok " +
          "JOIN uni ub ON bi.b = ub.tok, tb, tu WHERE c_ab >= 5 " +
          "ORDER BY pmi DESC, a, b LIMIT 15")
    ),
    Q(
      "vec_rrf_fusion",
      (s, dir) => {
        graft.functions.VecExprs.register(s)
        val v = T(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            sqrt(expr("fvdot(embedding, embedding)")).as("nrm"))
          .filter(col("nrm") > 0)
        def ranker(qid: Int): org.apache.spark.sql.DataFrame = {
          val q = broadcast(v.filter(col("vec_id") === qid)
            .select(col("embedding").as("eq"), col("nrm").as("nq")))
          val top = v.filter(col("vec_id") > 1)
            .crossJoin(q)
            .select(col("vec_id"),
              dround(expr("fvdot(embedding, eq)") /
                (col("nrm") * col("nq")), 6).as("sim"))
            .orderBy(col("sim").desc, col("vec_id"))
            .limit(100)
          top.select(col("vec_id"),
            row_number().over(Window.orderBy(col("sim").desc,
              col("vec_id"))).cast("long").as(s"r$qid"))
        }
        ranker(0).join(ranker(1), Seq("vec_id"), "full_outer")
          .withColumn("rrf", dround(
            coalesce(lit(1.0) / (lit(60) + col("r0")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("r1")), lit(0.0)), 6))
          .select("vec_id", "r0", "r1", "rrf")
          .orderBy(col("rrf").desc, col("vec_id"))
          .limit(10)
      },
      Some(
        "WITH v0 AS (SELECT vec_id, embedding, sqrt((SELECT " +
          "sum(CAST(x.a AS DOUBLE) * x.a) FROM (SELECT unnest(embedding) " +
          "AS a) x)) AS nrm FROM embeddings), " +
          "v AS (SELECT * FROM v0 WHERE nrm > 0), " +
          "sims AS (SELECT q.vec_id AS qid, v.vec_id, " +
          "round((SELECT sum(CAST(z.x AS DOUBLE) * z.y) FROM " +
          "(SELECT unnest(v.embedding) AS x, unnest(q.embedding) AS y) z) " +
          "/ (v.nrm * q.nrm) * 1e6) / 1e6 AS sim " +
          "FROM v, v q WHERE q.vec_id IN (0, 1) AND v.vec_id > 1), " +
          "rk AS (SELECT qid, vec_id, CAST(row_number() OVER " +
          "(PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS r " +
          "FROM sims), " +
          "t0 AS (SELECT vec_id, r AS r0 FROM rk WHERE qid = 0 AND " +
          "r <= 100), " +
          "t1 AS (SELECT vec_id, r AS r1 FROM rk WHERE qid = 1 AND " +
          "r <= 100) " +
          "SELECT vec_id, r0, r1, " +
          droundSql("coalesce(CAST(1.0 AS DOUBLE) / (60 + r0), 0.0) + " +
            "coalesce(CAST(1.0 AS DOUBLE) / (60 + r1), 0.0)", 6) +
          " AS rrf " +
          "FROM t0 FULL JOIN t1 USING (vec_id) " +
          "ORDER BY rrf DESC, vec_id LIMIT 10")
    ),
    Q(
      "stats_diff_in_diff",
      (s, dir) => {
        // 2x2 DiD on purchase value: treat = user parity, split at the
        // fixture midpoint; per-cell CENT-integer sums (deterministic),
        // double combine for the variance (n·ss − s² overflows int64)
        val cells = T(s, dir, "events")
          .filter(col("event_type") === "purchase" &&
            col("user_id").isNotNull)
          .select((col("user_id") % 2).as("treat"),
            when(col("ts") < lit("2024-01-16"), lit(0L)).otherwise(1L)
              .as("post"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("treat", "post")
          .agg(count(lit(1)).as("n"), sum("cents").as("sc"),
            sum(col("cents") * col("cents")).as("ssc"))
          .withColumn("mean", col("sc").cast("double") / col("n") / 100.0)
          .withColumn("varm",
            (col("n").cast("double") * col("ssc") -
              col("sc").cast("double") * col("sc")) /
              (col("n").cast("double") * (col("n") - 1)) /
              col("n") / 10000.0)
        cells.groupBy()
          .agg(
            sum(when(col("treat") === 1 && col("post") === 1,
              col("mean"))).as("m_t1"),
            sum(when(col("treat") === 1 && col("post") === 0,
              col("mean"))).as("m_t0"),
            sum(when(col("treat") === 0 && col("post") === 1,
              col("mean"))).as("m_c1"),
            sum(when(col("treat") === 0 && col("post") === 0,
              col("mean"))).as("m_c0"),
            sum("varm").as("var_did"))
          .select(
            dround(col("m_t1"), 4).as("m_t1"),
            dround(col("m_t0"), 4).as("m_t0"),
            dround(col("m_c1"), 4).as("m_c1"),
            dround(col("m_c0"), 4).as("m_c0"),
            dround(col("m_t1") - col("m_t0") -
              (col("m_c1") - col("m_c0")), 4).as("did"),
            dround(sqrt(col("var_did")), 4).as("se"),
            (abs(col("m_t1") - col("m_t0") -
              (col("m_c1") - col("m_c0"))) >
              lit(1.96) * sqrt(col("var_did"))).as("significant"))
      },
      Some(
        "WITH cells AS (SELECT user_id % 2 AS treat, " +
          "CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END " +
          "AS post, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc, " +
          "CAST(sum(CAST(round(value * 100) AS BIGINT) * " +
          "CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ssc " +
          "FROM events WHERE event_type = 'purchase' AND " +
          "user_id IS NOT NULL GROUP BY 1, 2), " +
          "d AS (SELECT treat, post, " +
          "CAST(sc AS DOUBLE) / n / 100.0 AS mean, " +
          "(CAST(n AS DOUBLE) * ssc - CAST(sc AS DOUBLE) * sc) / " +
          "(CAST(n AS DOUBLE) * (n - 1)) / n / 10000.0 AS varm FROM cells), " +
          "p AS (SELECT " +
          "sum(CASE WHEN treat = 1 AND post = 1 THEN mean END) AS m_t1, " +
          "sum(CASE WHEN treat = 1 AND post = 0 THEN mean END) AS m_t0, " +
          "sum(CASE WHEN treat = 0 AND post = 1 THEN mean END) AS m_c1, " +
          "sum(CASE WHEN treat = 0 AND post = 0 THEN mean END) AS m_c0, " +
          "sum(varm) AS var_did FROM d) " +
          "SELECT " + droundSql("m_t1", 4) + " AS m_t1, " +
          droundSql("m_t0", 4) + " AS m_t0, " +
          droundSql("m_c1", 4) + " AS m_c1, " +
          droundSql("m_c0", 4) + " AS m_c0, " +
          droundSql("m_t1 - m_t0 - (m_c1 - m_c0)", 4) + " AS did, " +
          droundSql("sqrt(var_did)", 4) + " AS se, " +
          "abs(m_t1 - m_t0 - (m_c1 - m_c0)) > 1.96 * sqrt(var_did) " +
          "AS significant FROM p")
    ),
    Q(
      "stats_kaplan_meier",
      (s, dir) => {
        val ev = T(s, dir, "events").filter(col("user_id").isNotNull)
        val fv = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("fv"))
        val fp = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min(col("ts")).as("fp"))
        // duration in whole days; right-censor non-converters (and
        // purchases BEFORE the first view) at the fixture horizon end
        val dur = fv.join(fp, Seq("user_id"), "left_outer")
          .select(
            when(col("fp").isNotNull && col("fp") >= col("fv"),
              datediff(to_date(col("fp")), to_date(col("fv"))))
              .otherwise(datediff(lit("2024-01-31").cast("date"),
                to_date(col("fv")))).cast("long").as("t"),
            (col("fp").isNotNull && col("fp") >= col("fv"))
              .cast("long").as("event"))
        val byDay = dur.groupBy("t")
          .agg(sum("event").as("d"),
            sum(lit(1L) - col("event")).as("c"))
        val n0 = dur.agg(count(lit(1)).as("n0"))
        // risk set walks the calendar-bounded day series (≤ horizon
        // days) — the single-partition window is bounded by the
        // calendar, not the data
        val w = Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
        val wS = Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byDay.crossJoin(broadcast(n0))
          .withColumn("n_risk",
            col("n0") - coalesce(sum(col("d") + col("c")).over(w),
              lit(0L)))
          .filter(col("d") > 0)
          .withColumn("survival", dround(exp(sum(
            log(lit(1.0) - col("d").cast("double") / col("n_risk")))
            .over(wS)), 6))
          .select(col("t"), col("n_risk"), col("d"), col("survival"))
          .orderBy("t")
      },
      Some(
        "WITH fv AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS fv " +
          "FROM events WHERE event_type = 'view' AND user_id IS NOT NULL " +
          "GROUP BY 1), " +
          "fp AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS fp " +
          "FROM events WHERE event_type = 'purchase' AND " +
          "user_id IS NOT NULL GROUP BY 1), " +
          "dur AS (SELECT CASE WHEN fp IS NOT NULL AND fp >= fv THEN " +
          "CAST(date_diff('day', CAST(fv AS DATE), CAST(fp AS DATE)) " +
          "AS BIGINT) ELSE CAST(date_diff('day', CAST(fv AS DATE), " +
          "DATE '2024-01-31') AS BIGINT) END AS t, " +
          "CAST(CASE WHEN fp IS NOT NULL AND fp >= fv THEN 1 ELSE 0 END " +
          "AS BIGINT) AS event FROM fv LEFT JOIN fp USING (user_id)), " +
          "bd AS (SELECT t, CAST(sum(event) AS BIGINT) AS d, " +
          "CAST(sum(1 - event) AS BIGINT) AS c FROM dur GROUP BY 1), " +
          "n0 AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM dur), " +
          "rs AS (SELECT t, d, c, CAST(n0 - coalesce(sum(d + c) OVER " +
          "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 " +
          "PRECEDING), 0) AS BIGINT) AS n_risk FROM bd, n0), " +
          "km AS (SELECT t, n_risk, d, exp(sum(ln(1.0 - " +
          "CAST(d AS DOUBLE) / n_risk)) OVER (ORDER BY t ROWS BETWEEN " +
          "UNBOUNDED PRECEDING AND CURRENT ROW)) AS s " +
          "FROM rs WHERE d > 0) " +
          "SELECT t, n_risk, d, " + droundSql("s", 6) + " AS survival " +
          "FROM km ORDER BY t")
    )
  )
}
