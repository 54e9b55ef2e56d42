package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det.{davg, davgSql, dround, droundSql}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 6: privacy suppression, path mining, asymmetric
  * containment dedup, and the batched kNN join.
  *
  *  - `data_kanon_suppress`: k-anonymity gate — rows whose
  *    quasi-identifier group (event_type, day, value band) has fewer than
  *    k=5 members are suppressed before release. The two-level aggregate
  *    keeps the group-size pass and the release report in one shuffle
  *    chain; no row-level data leaves the engine.
  *  - `events_user_journey`: top event-type trigram paths across user
  *    sessions — one window pass (two leads) per user timeline, then a
  *    global count. The path-mining shape behind funnel discovery.
  *  - `text_containment`: asymmetric near-dup — containment
  *    |A∩B| / |A| catches a document embedded inside a larger one, which
  *    symmetric Jaccard dilutes below threshold. Exactness baseline on the
  *    guarded slice (the LSH twin would bucket as text_dedup_crosslang_lsh
  *    does).
  *  - `vec_knn_join`: per-query top-3 cosine neighbors for a query batch
  *    (vec_id < 100) — the kNN-join shape: broadcast the query batch,
  *    scan the corpus once, rank per query. Exact; the IVF ops are the
  *    approximate scale path.
  */
object Wave6Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "data_kanon_suppress",
      (s, dir) => {
        val groups = T(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).as("d"),
            floor(col("value") / 100).cast("long").as("band"))
          .agg(count(lit(1)).as("n"))
        groups.groupBy("event_type")
          .agg(
            sum(when(col("n") >= 5, col("n")).otherwise(0L))
              .as("n_retained"),
            sum(when(col("n") < 5, col("n")).otherwise(0L))
              .as("n_suppressed"),
            count(when(col("n") < 5, lit(1))).as("n_small_groups"))
          .orderBy("event_type")
      },
      Some(
        "WITH g AS (SELECT event_type, " +
          "date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, " +
          "CAST(floor(value / 100) AS BIGINT) AS band, count(*) AS n " +
          "FROM events GROUP BY 1, 2, 3) " +
          "SELECT event_type, " +
          "CAST(sum(CASE WHEN n >= 5 THEN n ELSE 0 END) AS BIGINT) " +
          "AS n_retained, " +
          "CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) " +
          "AS n_suppressed, " +
          "CAST(count(CASE WHEN n < 5 THEN 1 END) AS BIGINT) " +
          "AS n_small_groups " +
          "FROM g GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "events_user_journey",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        T(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("e2", lead("event_type", 1).over(w))
          .withColumn("e3", lead("event_type", 2).over(w))
          .filter(col("e3").isNotNull)
          .select(concat(col("event_type"), lit(">"), col("e2"),
            lit(">"), col("e3")).as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(20)
      },
      Some(
        "WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, " +
          "event_id, event_type FROM events), " +
          "s AS (SELECT event_type || '>' || lead(event_type, 1) OVER w " +
          "|| '>' || lead(event_type, 2) OVER w AS path, " +
          "lead(event_type, 2) OVER w AS e3 FROM o " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)) " +
          "SELECT path, CAST(count(*) AS BIGINT) AS n FROM s " +
          "WHERE e3 IS NOT NULL " +
          "GROUP BY path ORDER BY n DESC, path LIMIT 20")
    ),
    Q(
      "text_containment",
      // directed: doc_a's token set ≥90% inside doc_b's, a strictly the
      // smaller set (ties broken by id) so each pair appears once
      (s, dir) => {
        val slice = T(s, dir, "documents")
          .filter(col("lang") === "en" &&
            col("source").isin("src0", "src1"))
        graft.Guard.quadratic(slice, "text_containment")
        val t = slice.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("tk"))
        val a = t.select(col("doc_id").as("doc_a"), col("tk").as("ta"),
          size(col("tk")).as("la"))
        val b = t.select(col("doc_id").as("doc_b"), col("tk").as("tb"),
          size(col("tk")).as("lb"))
        a.join(b, col("doc_a") =!= col("doc_b") &&
            (col("la") < col("lb") ||
              (col("la") === col("lb") && col("doc_a") < col("doc_b"))))
          .select(col("doc_a"), col("doc_b"),
            dround(size(array_intersect(col("ta"), col("tb")))
              .cast("double") / col("la"), 6).as("cont"))
          .filter(col("cont") >= 0.9)
          .orderBy("doc_a", "doc_b")
      },
      Some(
        "WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) " +
          "AS tk FROM documents " +
          "WHERE lang = 'en' AND source IN ('src0', 'src1')), " +
          "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
          droundSql("CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) " +
            "/ len(a.tk)", 6) + " AS cont " +
          "FROM t a JOIN t b ON a.doc_id <> b.doc_id AND " +
          "(len(a.tk) < len(b.tk) OR " +
          "(len(a.tk) = len(b.tk) AND a.doc_id < b.doc_id))) " +
          "SELECT doc_a, doc_b, cont FROM p WHERE cont >= 0.9 " +
          "ORDER BY doc_a, doc_b")
    ),
    Q(
      "text_bigram_xent",
      // bigram-LM cross-entropy — one model-quality notch above
      // text_unigram_xent: p(v|u) = (c(uv)+k) / (c(u)+k·V), add-k
      // smoothed (k=0.5), scored as the per-doc mean -ln p over its
      // bigrams. Counts are corpus aggregates that broadcast; the smoothed
      // probability is derived per row from integers, so both engines
      // compute bit-identical doubles and davg pins the mean.
      (s, dir) => {
        val docs = T(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 2)
        val bg = docs.select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(toks[i-1] AS u, toks[i] AS v))")).as("b"))
          .select(col("doc_id"), col("b.u").as("u"), col("b.v").as("v"))
        val vocab = T(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .agg(countDistinct("tok")).collect()(0).getLong(0)
        val cuv = bg.groupBy("u", "v").agg(count(lit(1)).as("cuv"))
        val cu = bg.groupBy("u").agg(count(lit(1)).as("cu"))
        bg.join(broadcast(cuv), Seq("u", "v"))
          .join(broadcast(cu), Seq("u"))
          .withColumn("p",
            (col("cuv") + lit(0.5)) / (col("cu") + lit(0.5) * vocab))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            davg(-log(col("p")), 6).as("xent"))
          .orderBy("doc_id")
      },
      Some(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks " +
          "FROM documents), " +
          "f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2), " +
          "bg AS (SELECT doc_id, unnest(list_transform(" +
          "generate_series(2, len(toks)), " +
          "i -> {'u': toks[i-1], 'v': toks[i]})) AS b FROM f), " +
          "pairs AS (SELECT doc_id, b.u AS u, b.v AS v FROM bg), " +
          "vv AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS vocab " +
          "FROM (SELECT unnest(string_split(text, ' ')) AS tok " +
          "FROM documents)), " +
          "cuv AS (SELECT u, v, count(*) AS cuv FROM pairs GROUP BY 1, 2), " +
          "cu AS (SELECT u, count(*) AS cu FROM pairs GROUP BY 1), " +
          "sc AS (SELECT p.doc_id, " +
          "(cuv.cuv + 0.5) / (cu.cu + 0.5 * (SELECT vocab FROM vv)) AS p " +
          "FROM pairs p JOIN cuv ON p.u = cuv.u AND p.v = cuv.v " +
          "JOIN cu ON p.u = cu.u) " +
          "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
          davgSql("-ln(p)", 6) + " AS xent " +
          "FROM sc GROUP BY doc_id ORDER BY doc_id")
    ),
    Q(
      "source_log_lines",
      // raw-log ingestion: events rendered as key=value text lines (cents
      // as integers — log text must round-trip, so no float formatting),
      // read back with spark.read.text + regexp_extract into typed
      // columns. The classic first mile of log ETL; the oracle states the
      // logical aggregate straight off the events table, so the whole
      // render→parse round trip must be lossless to pass.
      (s, dir) => {
        val out = graft.Tmp.dir("graft_loglines")
        T(s, dir, "events")
          .select(concat(
            lit("evt id="), col("event_id"),
            lit(" user="), col("user_id"),
            lit(" type="), col("event_type"),
            lit(" cents="), round(col("value") * 100).cast("long"))
            .as("value"))
          .write.mode("overwrite").text(out)
        s.read.text(out)
          .select(
            regexp_extract(col("value"), "id=(\\d+)", 1)
              .cast("long").as("event_id"),
            regexp_extract(col("value"), "type=(\\w+)", 1)
              .as("event_type"),
            regexp_extract(col("value"), "cents=(-?\\d+)", 1)
              .cast("long").as("cents"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            min("event_id").as("first_id"),
            sum("cents").as("total_cents"))
          .orderBy("event_type")
      },
      Some(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
          "min(event_id) AS first_id, " +
          "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) " +
          "AS total_cents " +
          "FROM events GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "vec_knn_join",
      // batched kNN join: broadcast the query batch, one corpus scan,
      // per-query rank — at 100 TB the corpus side stays partitioned and
      // each partition emits only its local query×row candidates
      (s, dir) => {
        graft.functions.VecExprs.register(s)
        val v = T(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            sqrt(expr("fvdot(embedding, embedding)")).as("nrm"))
          .filter(col("nrm") > 0)
        val q = broadcast(v.filter(col("vec_id") < 100)
          .select(col("vec_id").as("q_id"), col("embedding").as("eq"),
            col("nrm").as("nq")))
        val w = Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("vec_id"))
        v.join(q, col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            dround(expr("fvdot(embedding, eq)") / (col("nrm") * col("nq")),
              6).as("sim"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("q_id"), col("rk").cast("long").as("rk"),
            col("vec_id"), col("sim"))
          .orderBy("q_id", "rk")
      },
      Some(
        "WITH v0 AS (SELECT vec_id, embedding, " +
          "sqrt((SELECT sum(CAST(x.a AS DOUBLE)*x.a) " +
          "FROM (SELECT unnest(embedding) AS a) x)) AS nrm " +
          "FROM embeddings), " +
          "v AS (SELECT * FROM v0 WHERE nrm > 0), " +
          "q AS (SELECT vec_id AS q_id, embedding AS eq, nrm AS nq " +
          "FROM v WHERE vec_id < 100), " +
          "p AS (SELECT q.q_id, v.vec_id, " +
          droundSql("(SELECT sum(CAST(z.x AS DOUBLE)*z.y) FROM " +
            "(SELECT unnest(v.embedding) AS x, unnest(q.eq) AS y) z) " +
            "/ (v.nrm*q.nq)", 6) + " AS sim " +
          "FROM v, q WHERE v.vec_id <> q.q_id), " +
          "r AS (SELECT q_id, vec_id, sim, row_number() OVER " +
          "(PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rk FROM p) " +
          "SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, sim FROM r " +
          "WHERE rk <= 3 ORDER BY q_id, rk")
    )
  )
}
