package graft.ops

import graft.{Q, QueryModule, T}
import graft.text.TextAlgs
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 wave 60: dedup DECISION signals — the numbers a curation
  * pipeline thresholds on, computed from the machinery waves 5/59 built.
  *
  *  - `text_dup_coverage` turns text_dup_runs' maximal duplicated runs
  *    into the per-document substring-dedup signal: the fraction of a
  *    document's tokens covered by SOME cross-document duplicated run
  *    (both roles — a doc is boilerplate whether it copied or was
  *    copied). Intervals from multiple partners/diagonals overlap, so
  *    the per-doc tally is an interval UNION (running-max
  *    gaps-and-islands window, the ts_interval_union_len shape), never
  *    a naive sum that double-counts. This is the published
  *    exact-substring dedup decision rule: drop/trim docs whose
  *    coverage exceeds a threshold.
  *  - `text_minhash_recall` MEASURES the house 16x4 MinHash banding
  *    against exact ground truth on the text_dedup_near slice: true
  *    pairs (Jaccard >= 0.8, 1e-6-rounded), candidate pairs (>= 1
  *    shared band AND the size-ratio prune — exactly the pipeline's
  *    candidate set), and the recall/precision of candidates vs truth.
  *    The eval that justifies the banding parameters instead of
  *    assuming them ("measure, don't guess" applied to LSH recall —
  *    the sibling of vec_ivf_recall_sweep on the lexical side). No
  *    oracle (seeded MinHash, SURVEY §2.10); Wave60Spec pins equality
  *    with a driver-side replay of both sets.
  */
object Wave60Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "text_dup_coverage",
      (s, dir) => {
        // the ONE runs definition (Wave59Ops.dupRuns) — coverage and the
        // runs report cannot drift apart on shingle width / cut / islands
        val runs = Wave59Ops.dupRuns(s, dir)
        val docs = Wave59Ops.enTokenDocs(s, dir)
        // BOTH roles: a doc's tokens are duplicated whether it is the
        // lower- or higher-id member of the pair
        val ivals = runs
          .select(col("doc_a").as("doc_id"), col("a_start").as("lo"),
            (col("a_start") + col("n_tokens")).as("hi"))
          .unionAll(runs.select(col("doc_b").as("doc_id"),
            col("b_start").as("lo"),
            (col("b_start") + col("n_tokens")).as("hi")))
        // interval UNION per doc: runs from different partners overlap
        val wo = Window.partitionBy("doc_id").orderBy("lo", "hi")
          .rowsBetween(Window.unboundedPreceding, -1)
        val unioned = ivals
          .withColumn("pmax", max("hi").over(wo))
          .withColumn("isl", sum(
            when(col("pmax").isNull || col("lo") > col("pmax"), 1L)
              .otherwise(0L))
            .over(Window.partitionBy("doc_id").orderBy("lo", "hi")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("doc_id", "isl")
          .agg((max("hi") - min("lo")).as("len"))
          .groupBy("doc_id")
          .agg(sum("len").as("dup_tokens"))
        docs.select(col("doc_id"), size(col("toks")).cast("long")
            .as("n_tokens"))
          .join(unioned, Seq("doc_id"))
          .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
            round(col("dup_tokens").cast("double") / col("n_tokens")
              * 1e6).cast("long").divide(lit(1e6)).as("coverage"))
          .orderBy("doc_id")
      },
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
          "ORDER BY pa) AS isl FROM m), " +
          "runs AS (SELECT doc_a, doc_b, CAST(min(pa) AS BIGINT) AS " +
          "a_start, CAST(min(pb) AS BIGINT) AS b_start, " +
          "CAST(count(*) + 7 AS BIGINT) AS n_tokens " +
          "FROM r GROUP BY doc_a, doc_b, diag, isl), " +
          "iv AS (SELECT doc_a AS doc_id, a_start AS lo, " +
          "a_start + n_tokens AS hi FROM runs " +
          "UNION ALL SELECT doc_b, b_start, b_start + n_tokens " +
          "FROM runs), " +
          "mk AS (SELECT doc_id, lo, hi, max(hi) OVER (PARTITION BY " +
          "doc_id ORDER BY lo, hi ROWS BETWEEN UNBOUNDED PRECEDING AND " +
          "1 PRECEDING) AS pmax FROM iv), " +
          "isl AS (SELECT doc_id, lo, hi, sum(CASE WHEN pmax IS NULL " +
          "OR lo > pmax THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id " +
          "ORDER BY lo, hi ROWS BETWEEN UNBOUNDED PRECEDING AND " +
          "CURRENT ROW) AS isl FROM mk), " +
          "un AS (SELECT doc_id, CAST(sum(len) AS BIGINT) AS dup_tokens " +
          "FROM (SELECT doc_id, isl, max(hi) - min(lo) AS len FROM isl " +
          "GROUP BY doc_id, isl) GROUP BY doc_id) " +
          "SELECT f.doc_id, CAST(len(f.toks) AS BIGINT) AS n_tokens, " +
          "un.dup_tokens, CAST(round(CAST(un.dup_tokens AS DOUBLE) / " +
          "len(f.toks) * 1e6) AS BIGINT) / 1e6 AS coverage " +
          "FROM f JOIN un ON f.doc_id = un.doc_id ORDER BY f.doc_id")
    ),
    Q(
      "text_minhash_recall",
      (s, dir) => {
        import s.implicits._
        graft.functions.TextExprs.register(s)
        val feats = T(s, dir, "documents")
          .filter(col("lang") === "en" &&
            col("source").isin("src0", "src1"))
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .as[(Long, Seq[String])]
          .map { case (id, ts) =>
            val dist = ts.distinct
            (id, TextAlgs.lshBands(TextAlgs.minhash(dist)).toArray,
              dist.map(TextAlgs.tokenHash64).sorted.toArray)
          }.toDF("doc_id", "bands", "tokset")
          .persist()
        try {
          feats.count() // one dedicated cache-population job
          // ALL pairs on the bounded slice with exact Jaccard — the
          // ground truth (Guard-scale rationale of text_dedup_near)
          graft.Guard.quadratic(
            T(s, dir, "documents"), "text_minhash_recall")
          val a = feats.select(col("doc_id").as("doc_a"),
            col("bands").as("ba"), col("tokset").as("sa"))
          val b = feats.select(col("doc_id").as("doc_b"),
            col("bands").as("bb"), col("tokset").as("sb"))
          val pairs = a.join(b, col("doc_a") < col("doc_b"))
            .withColumn("inter",
              expr("lixsize(sa, sb)").cast("double"))
            .withColumn("jac", round(col("inter") /
              (size(col("sa")) + size(col("sb")) - col("inter")), 6))
            .withColumn("is_true", (col("jac") >= 0.8).cast("long"))
            // the pipeline's candidate predicate: >= 1 shared band AND
            // the size-ratio prune
            .withColumn("is_cand",
              (size(array_intersect(col("ba"), col("bb"))) > 0 &&
                least(size(col("sa")), size(col("sb")))
                  .cast("long") * 10000000L >=
                greatest(size(col("sa")), size(col("sb")))
                  .cast("long") * 7999995L).cast("long"))
          pairs.agg(
              sum("is_true").as("n_true"),
              sum("is_cand").as("n_candidates"),
              sum(col("is_true") * col("is_cand")).as("n_caught"))
            .select(col("n_true"), col("n_candidates"), col("n_caught"),
              round(col("n_caught").cast("double") / col("n_true")
                * 1e6).cast("long").divide(lit(1e6)).as("recall"),
              round(col("n_caught").cast("double") / col("n_candidates")
                * 1e6).cast("long").divide(lit(1e6)).as("precision"))
        } finally feats.unpersist(blocking = false)
      },
      None
    )
  )
}
