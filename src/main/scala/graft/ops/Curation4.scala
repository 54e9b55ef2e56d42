package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det.{dround, droundSql}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 curation wave 4 — the remaining LLM-training data-prep verbs:
  * content-hash split, source interleaving, context-window packing, and
  * the staged filter funnel.
  *
  * Scale notes:
  *  - `data_split_hash` is the production train/val/test split: bucket by
  *    a CONTENT-STABLE hash (md5 of the id), never by position or random()
  *    — membership survives re-runs, repartitions, and incremental
  *    appends. One scan, one partial-aggregable groupBy.
  *  - `data_interleave_sources` realizes a mixing schedule as a
  *    deterministic total order (round-robin by per-source rank). The
  *    rank windows partition by source — at 100 TB each source's window
  *    sorts independently; no global sort is needed until the final
  *    consumer, which streams in (rn, source) order.
  *  - `data_pack_ctx` is pretraining sequence packing in its standard
  *    form: concatenate the shard's token stream, cut every CTX tokens.
  *    Per-shard running sums (window) place every document at an absolute
  *    token offset; bin ids are integer division — no sequential driver
  *    loop, and shards are the parallelism unit exactly as in a real
  *    packing job.
  *  - `text_filter_funnel` is the curation report: one scan computes all
  *    stage flags (each stage ANDs the previous — monotone survival), the
  *    dedup keeper is selected only among stage-3 survivors via a
  *    conditional window min, and one aggregate emits the per-stage
  *    survivor counts.
  */
object Curation4 extends QueryModule {

  private val Ctx = 512

  def queries: Seq[Q] = Seq(
    Q(
      "data_split_hash",
      // 80/10/10-ish split on the first two hex digits of md5(doc_id):
      // train < 'cd' (205/256), val < 'e6' (25/256), else test. String
      // comparison on lowercase hex is identical in both engines.
      (s, dir) =>
        T(s, dir, "documents")
          .withColumn("h2",
            substring(md5(col("doc_id").cast("string")), 1, 2))
          .withColumn("split",
            when(col("h2") < "cd", "train")
              .when(col("h2") < "e6", "val")
              .otherwise("test"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_toks"))
          .orderBy("lang", "split"),
      Some(
        "WITH d AS (SELECT lang, text, substr(md5(CAST(doc_id AS " +
          "VARCHAR)), 1, 2) AS h2 FROM documents), " +
          "sp AS (SELECT lang, text, CASE WHEN h2 < 'cd' THEN 'train' " +
          "WHEN h2 < 'e6' THEN 'val' ELSE 'test' END AS split FROM d) " +
          "SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_toks " +
          "FROM sp GROUP BY lang, split ORDER BY lang, split")
    ),
    Q(
      "data_interleave_sources",
      // Round-robin interleave across sources — the deterministic
      // realization of an equal-weight mixing schedule. The position is
      // ARITHMETIC: pos = (rn-1)*n_sources + src_rank, from the
      // per-source rank (parallel window) and a broadcast source index —
      // NO global row_number anywhere (a no-partition window is a
      // single-task sort, the canonical 100 TB bottleneck; same pattern
      // as data_assign_ids' per-shard ranks + broadcast offsets).
      // Positions of exhausted sources leave gaps; consumers stream in
      // pos order, so density is irrelevant and determinism is total.
      (s, dir) => {
        val docs = T(s, dir, "documents").select(col("doc_id"),
          col("source"))
        val wSrc = Window.partitionBy("source").orderBy("doc_id")
        val wIdx = Window.orderBy("source") // over the DISTINCT sources only
        val srcIdx = docs.select("source").distinct()
          .select(col("source"), row_number().over(wIdx).cast("long")
            .as("src_rank"),
            count(lit(1)).over(Window.partitionBy(lit(1))).cast("long")
              .as("n_src"))
        docs
          .withColumn("rn", row_number().over(wSrc).cast("long"))
          .join(broadcast(srcIdx), "source")
          .select(
            ((col("rn") - 1) * col("n_src") + col("src_rank")).as("pos"),
            col("source"), col("doc_id"))
          .orderBy("pos")
      },
      Some(
        "WITH si AS (SELECT source, CAST(row_number() OVER (ORDER BY " +
          "source) AS BIGINT) AS src_rank, CAST((SELECT count(DISTINCT " +
          "source) FROM documents) AS BIGINT) AS n_src " +
          "FROM (SELECT DISTINCT source FROM documents)), " +
          "r AS (SELECT doc_id, source, CAST(row_number() OVER " +
          "(PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn " +
          "FROM documents) " +
          "SELECT (r.rn - 1) * si.n_src + si.src_rank AS pos, r.source, " +
          "r.doc_id FROM r JOIN si USING (source) ORDER BY pos")
    ),
    Q(
      "data_pack_ctx",
      // Sequence packing: per md5-shard, documents concatenate in hash
      // order into one token stream cut every Ctx tokens. Emits each
      // document's absolute offset and the context windows it lands in.
      (s, dir) => {
        val w = Window.partitionBy("shard").orderBy("h", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, dir, "documents")
          .select(col("doc_id"),
            md5(col("doc_id").cast("string")).as("h"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .withColumn("shard", substring(col("h"), 1, 1))
          .withColumn("end_tok", sum("toks").over(w))
          .select(col("shard"), col("doc_id"), col("toks"),
            (col("end_tok") - col("toks")).as("start_tok"),
            expr(s"(end_tok - toks) div $Ctx").as("first_bin"),
            expr(s"(end_tok - 1) div $Ctx").as("last_bin"))
          .orderBy("doc_id")
      },
      Some(
        "WITH d AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h, " +
          "CAST(len(string_split(text, ' ')) AS BIGINT) AS toks " +
          "FROM documents), " +
          "sh AS (SELECT *, substr(h, 1, 1) AS shard FROM d), " +
          "c AS (SELECT shard, doc_id, toks, sum(toks) OVER " +
          "(PARTITION BY shard ORDER BY h, doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok " +
          "FROM sh) " +
          // end_tok is a windowed sum → HUGEINT in DuckDB; every derived
          // column must be CAST back to BIGINT or the driver comparator
          // sees float64 vs Spark's int64 (round-3 hash-fail, VERDICT #1).
          "SELECT shard, doc_id, toks, " +
          "CAST(end_tok - toks AS BIGINT) AS start_tok, " +
          s"CAST((end_tok - toks) // $Ctx AS BIGINT) AS first_bin, " +
          s"CAST((end_tok - 1) // $Ctx AS BIGINT) AS last_bin " +
          "FROM c ORDER BY doc_id")
    ),
    Q(
      "text_quality_model",
      // Model-based quality scoring as a pure EXPRESSION: a fixed-weight
      // linear model over four lexical features (the fasttext-quality-
      // filter shape, with the learned weights frozen into the query).
      // No UDF, no broadcast — the whole scorer codegens into the scan
      // projection, which is what makes model-filtering free at 100 TB.
      // All features derive from integer counts, so the double
      // arithmetic is bit-identical across engines.
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("double").as("toks"),
            size(array_distinct(split(col("text"), " "))).cast("double")
              .as("uniq"),
            size(filter(split(col("text"), " "),
              t => t.isin("the", "a", "of", "and", "to"))).cast("double")
              .as("stops"),
            length(expr("replace(text, ' ', '')")).cast("double")
              .as("chars"))
          .select(col("doc_id"),
            dround(
              col("uniq") / col("toks") * 2.0 +
                col("stops") / col("toks") * 0.5 -
                col("chars") / col("toks") * 0.1 +
                col("toks") * 0.01 - 1.0, 6).as("score"))
          .withColumn("keep", col("score") > 0)
          .orderBy("doc_id"),
      Some(
        "WITH f AS (SELECT doc_id, " +
          "CAST(len(string_split(text, ' ')) AS DOUBLE) AS toks, " +
          "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) " +
          "AS uniq, " +
          "CAST(len(list_filter(string_split(text, ' '), t -> t IN " +
          "('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) AS stops, " +
          "CAST(length(replace(text, ' ', '')) AS DOUBLE) AS chars " +
          "FROM documents) " +
          "SELECT doc_id, " +
          droundSql(
            "uniq / toks * 2.0 + stops / toks * 0.5 - " +
              "chars / toks * 0.1 + toks * 0.01 - 1.0", 6) +
          " AS score, " +
          droundSql(
            "uniq / toks * 2.0 + stops / toks * 0.5 - " +
              "chars / toks * 0.1 + toks * 0.01 - 1.0", 6) +
          " > 0 AS keep " +
          "FROM f ORDER BY doc_id")
    ),
    Q(
      "text_winnow_fp",
      // Winnowing document fingerprints (the MOSS algorithm): token
      // 3-gram hashes, window w=4, rightmost-min selection. Per doc:
      // gram count, fingerprint count, and an order-independent XOR
      // checksum of the selected hashes. Guarantee (pinned in
      // Curation4Spec): any shared token run of >= w+k-1 tokens between
      // two documents shares a fingerprint — the principled basis for
      // substring-level dedup, vs the fixed-stride chunking of
      // text_chunk_dedup. No oracle (seeded-hash-specific).
      (s, dir) => {
        import s.implicits._
        T(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .as[(Long, Seq[String])]
          .map { case (id, ts) =>
            val fps = graft.text.TextAlgs.winnow(ts)
            (id, math.max(ts.length - 2, 0).toLong, fps.length.toLong,
              fps.foldLeft(0L)((a, f) => a ^ f._2))
          }
          .toDF("doc_id", "n_grams", "n_fps", "fp_xor")
          .orderBy("doc_id")
      },
      None
    ),
    Q(
      "text_filter_funnel",
      // Staged curation funnel in ONE scan: length → language → lexical
      // diversity → exact-dup keeper (selected among stage-3 survivors
      // only), reported as cumulative survivor counts per stage.
      (s, dir) => {
        val base = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            md5(col("text")).as("h"),
            size(array_distinct(split(col("text"), " "))).cast("double")
              .as("uniq"),
            size(split(col("text"), " ")).cast("double").as("toks"))
          .withColumn("s1", col("n_chars") >= 100)
          .withColumn("s2", col("s1") && col("lang") =!= "zh")
          .withColumn("s3", col("s2") && col("uniq") / col("toks") >= 0.35)
        val keeper = base.withColumn("keep_id",
          min(when(col("s3"), col("doc_id"))).over(
            Window.partitionBy("h")))
          .withColumn("s4", col("s3") && col("doc_id") === col("keep_id"))
        keeper.agg(
          count(lit(1)).as("ingest"),
          sum(when(col("s1"), 1L).otherwise(0L)).as("len_ok"),
          sum(when(col("s2"), 1L).otherwise(0L)).as("lang_ok"),
          sum(when(col("s3"), 1L).otherwise(0L)).as("quality_ok"),
          sum(when(col("s4"), 1L).otherwise(0L)).as("dedup_ok"))
          .selectExpr("stack(5, 0L, 'ingest', ingest, 1L, 'length', " +
            "len_ok, 2L, 'language', lang_ok, 3L, 'quality', quality_ok, " +
            "4L, 'dedup', dedup_ok) AS (stage_id, stage, n_docs)")
          .orderBy("stage_id")
      },
      Some(
        "WITH b AS (SELECT doc_id, lang, n_chars, md5(text) AS h, " +
          "len(list_distinct(string_split(text, ' '))) * 1.0 AS uniq, " +
          "len(string_split(text, ' ')) * 1.0 AS toks FROM documents), " +
          "f AS (SELECT *, (n_chars >= 100) AS s1, " +
          "(n_chars >= 100 AND lang <> 'zh') AS s2, " +
          "(n_chars >= 100 AND lang <> 'zh' AND uniq / toks >= 0.35) " +
          "AS s3 FROM b), " +
          "k AS (SELECT *, (s3 AND doc_id = min(CASE WHEN s3 THEN doc_id " +
          "END) OVER (PARTITION BY h)) AS s4 FROM f), " +
          "a AS (SELECT CAST(count(*) AS BIGINT) AS ingest, " +
          "CAST(count(*) FILTER (WHERE s1) AS BIGINT) AS len_ok, " +
          "CAST(count(*) FILTER (WHERE s2) AS BIGINT) AS lang_ok, " +
          "CAST(count(*) FILTER (WHERE s3) AS BIGINT) AS quality_ok, " +
          "CAST(count(*) FILTER (WHERE s4) AS BIGINT) AS dedup_ok FROM k) " +
          "SELECT * FROM (" +
          "SELECT CAST(0 AS BIGINT) AS stage_id, 'ingest' AS stage, " +
          "ingest AS n_docs FROM a UNION ALL " +
          "SELECT 1, 'length', len_ok FROM a UNION ALL " +
          "SELECT 2, 'language', lang_ok FROM a UNION ALL " +
          "SELECT 3, 'quality', quality_ok FROM a UNION ALL " +
          "SELECT 4, 'dedup', dedup_ok FROM a) ORDER BY stage_id")
    )
  )
}
