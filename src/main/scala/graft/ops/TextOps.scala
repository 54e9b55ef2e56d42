package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det.{davg, davgSql}
import graft.text.TextAlgs
import org.apache.spark.sql.functions._

/** SURVEY §2.9 text half + training-data-pipeline text analysis: stats,
  * quality scoring, exact/near/MinHash-LSH/SimHash dedup, fingerprinting,
  * BPE-ish token counting, language ID.
  *
  * The canonical pre-pass for this whole dedup family is `text_normalize`
  * (TextOps2): NFC + case-fold + punctuation/zero-width strip. The ops
  * here consume raw `text` because the fixtures are pre-cleaned; a real
  * corpus pipeline keys them on text_normalize's output instead.
  *
  * Scale notes: exact dedup is a hash groupBy on md5(text) — one shuffle of
  * (hash, id), never the text bodies. Near-dup has two paths: the
  * oracle-checked exact-Jaccard on a blocked slice (quadratic — test scale
  * only), and the MinHash-LSH path (`text_dedup_minhash`) whose cost is
  * linear in docs + bucket-local pairs: the 100 TB design. No UDFs; the
  * few typed-map ops hash fixed-seed Murmur3, so results are identical
  * across executors.
  */
object TextOps extends QueryModule {

  /** Language-ID as PURE expressions (no UDF — the whole scorer stays in
    * whole-stage codegen): HAN-block char ratio decides zh; otherwise
    * marker-stopword hit counts per language, folded to the (max hits,
    * lexicographically-least lang) winner, 'en' fallback on zero hits.
    * Mirrors TextAlgs.detectLang exactly — TextAlgsSpec pins parity on
    * real multilingual strings. HAN detection covers the BMP CJK blocks
    * plus Ext-B..F (supplementary divergence from UnicodeScript.HAN is
    * radicals-only — none appear in running text).
    */
  private[graft] def langIdExpr(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val toks = split(lower(text), "\\s+")
    // lang-sorted entries + strict > fold == sortBy(-hits, lang).head
    val entries = TextAlgs.markerLangs.map { case (l, ms) =>
      struct(
        size(filter(toks, t => t.isInCollection(ms))).as("n"),
        lit(l).as("l"))
    }
    val best = aggregate(
      array(entries: _*),
      struct(lit(-1).as("n"), lit("").as("l")),
      (acc, x) => when(x.getField("n") > acc.getField("n"), x)
        .otherwise(acc))
    val cjk = size(regexp_extract_all(text,
      lit("[\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}\\x{F900}-\\x{FAFF}" +
        "\\x{20000}-\\x{2FA1F}]"), lit(0)))
    when(cjk.cast("double") > length(text).cast("double") * 0.2, lit("zh"))
      .otherwise(when(best.getField("n") === 0, lit("en"))
        .otherwise(best.getField("l")))
  }

  def queries: Seq[Q] = Seq(
    Q(
      "text_stats",
      (s, dir) =>
        T(s, dir, "documents")
          .select(
            col("lang"),
            size(split(col("text"), " ")).cast("long").as("toks"),
            length(expr("replace(text, ' ', '')")).cast("double")
              .as("charsum"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            // toks is integral-valued: its double sum is exact (< 2^53),
            // so plain round(avg) is aggregation-order-proof here.
            round(avg(col("toks").cast("double")), 4).as("avg_tokens"),
            // charsum/toks is NOT integral → davg (scaled-int sum)
            davg(col("charsum") / col("toks"), 6).as("avg_tok_len"),
            max("toks").as("max_tokens"))
          .orderBy("lang"),
      Some(
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "round(avg(CAST(len(string_split(text,' ')) AS DOUBLE)),4) AS avg_tokens, " +
          davgSql("CAST(length(replace(text,' ','')) AS DOUBLE) / " +
            "len(string_split(text,' '))", 6) + " AS avg_tok_len, " +
          "CAST(max(len(string_split(text,' '))) AS BIGINT) AS max_tokens " +
          "FROM documents GROUP BY lang ORDER BY lang")
    ),
    Q(
      "text_dedup_exact",
      (s, dir) =>
        T(s, dir, "documents")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_uniq"),
            (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dups"))
          .orderBy("lang"),
      Some(
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_uniq, " +
          "CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dups " +
          "FROM documents GROUP BY lang ORDER BY lang")
    ),
    Q(
      "text_dedup_groups",
      // Keeper selection per duplicate group, keyed on the CONTENT
      // fingerprint (sorted distinct token set) — catches bag-permutation
      // duplicates, which exist at t2 scale (byte-exact dups don't).
      (s, dir) =>
        T(s, dir, "documents")
          .groupBy(md5(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " ")))))
            .as("h"))
          .agg(
            min("doc_id").as("keeper"),
            count(lit(1)).as("n_copies"))
          .filter(col("n_copies") > 1)
          .select("h", "keeper", "n_copies")
          .orderBy("keeper"),
      Some(
        "SELECT md5(array_to_string(list_sort(list_distinct(" +
          "string_split(text, ' '))), ' ')) AS h, min(doc_id) AS keeper, " +
          "CAST(count(*) AS BIGINT) AS n_copies FROM documents " +
          "GROUP BY 1 HAVING count(*) > 1 ORDER BY keeper")
    ),
    Q(
      "text_dedup_near",
      // Exact token-set Jaccard >= 0.8 on a blocked slice (lang='en',
      // two sources) — the oracle-checkable formulation of near-dup.
      // O(n²) exactness baseline: Guard.quadratic enforces the bound.
      (s, dir) => {
        graft.Guard.quadratic(T(s, dir, "documents"), "text_dedup_near")
        val toks = T(s, dir, "documents")
          .filter(col("lang") === "en" &&
            col("source").isin("src0", "src1"))
          .select(col("doc_id"),
            array_distinct(split(col("text"), " ")).as("tokset"))
        val a = toks.select(col("doc_id").as("doc_a"),
          col("tokset").as("set_a"))
        val b = toks.select(col("doc_id").as("doc_b"),
          col("tokset").as("set_b"))
        a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("inter",
            size(array_intersect(col("set_a"), col("set_b")))
              .cast("double"))
          .withColumn("jac",
            round(col("inter") / (size(col("set_a")) + size(col("set_b"))
              - col("inter")), 6))
          .filter(col("jac") >= 0.8)
          .select("doc_a", "doc_b", "jac")
          .orderBy("doc_a", "doc_b")
      },
      Some(
        "WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tokset " +
          "FROM documents WHERE lang = 'en' AND source IN ('src0','src1')), " +
          "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
          "CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE) AS inter, " +
          "len(a.tokset) AS la, len(b.tokset) AS lb " +
          "FROM t a JOIN t b ON a.doc_id < b.doc_id) " +
          "SELECT doc_a, doc_b, round(inter / (la + lb - inter), 6) AS jac FROM p " +
          "WHERE round(inter / (la + lb - inter), 6) >= 0.8 ORDER BY doc_a, doc_b")
    ),
    Q(
      "text_dedup_ngram",
      // Near-dup via 3-gram (shingle) Jaccard — order-sensitive, so it
      // discriminates far harder than token-set Jaccard: shuffled copies
      // of the same bag share tokens but few shingles. Same blocked slice
      // as text_dedup_near; threshold 0.01 (shingle overlap is rare by
      // construction here — max pairwise shingle-jaccard is ~0.02, so the
      // low threshold keeps the oracle comparison non-trivial).
      // O(n²) exactness baseline: Guard.quadratic enforces the bound.
      (s, dir) => {
        graft.Guard.quadratic(T(s, dir, "documents"), "text_dedup_ngram")
        val sh = T(s, dir, "documents")
          .filter(col("lang") === "en" &&
            col("source").isin("src0", "src1"))
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("shingles", expr(
            "CASE WHEN size(toks) < 3 THEN array() ELSE " +
              "array_distinct(transform(sequence(1, size(toks) - 2), " +
              "i -> concat_ws(' ', element_at(toks, i), " +
              "element_at(toks, i + 1), element_at(toks, i + 2)))) END"))
          .select("doc_id", "shingles")
        val a = sh.select(col("doc_id").as("doc_a"),
          col("shingles").as("sh_a"))
        val b = sh.select(col("doc_id").as("doc_b"),
          col("shingles").as("sh_b"))
        a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("inter",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .withColumn("jac",
            round(col("inter") / (size(col("sh_a")) + size(col("sh_b"))
              - col("inter")), 6))
          .filter(col("jac") >= 0.01)
          .select("doc_a", "doc_b", "jac")
          .orderBy("doc_a", "doc_b")
      },
      Some(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents " +
          "WHERE lang = 'en' AND source IN ('src0','src1')), " +
          "g AS (SELECT doc_id, list_distinct(list_transform(" +
          "generate_series(1, len(toks) - 2), " +
          "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh FROM t), " +
          "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
          "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS inter, " +
          "len(a.sh) AS la, len(b.sh) AS lb FROM g a JOIN g b ON a.doc_id < b.doc_id) " +
          "SELECT doc_a, doc_b, round(inter / (la + lb - inter), 6) AS jac FROM p " +
          "WHERE round(inter / (la + lb - inter), 6) >= 0.01 ORDER BY doc_a, doc_b")
    ),
    Q(
      "text_dedup_minhash",
      // MinHash-LSH near-dup — the scale path: cost is linear in docs plus
      // bucket-local candidate pairs (vs the exact op's quadratic all-pairs).
      // Blocked per lang shard, as a production pipeline shards dedup; this
      // synthetic corpus is LSH-adversarial (one shared vocabulary makes
      // ~25% of ALL pairs near-dups, so candidates are inherently dense).
      // No oracle (seeded-hash-specific); TextAlgsSpec asserts the verified
      // pairs equal the exact-Jaccard pairs on the shared slice.
      (s, dir) => {
        import s.implicits._
        graft.functions.TextExprs.register(s)
        // one tokenize pass computes BOTH the LSH band keys and the sorted
        // 64-bit token-hash set, persisted: the band self-join plus the two
        // verify-side joins would otherwise re-tokenize and re-minhash the
        // corpus four times — at 100 TB that is four full scans vs one
        val docFeats = T(s, dir, "documents")
          .filter(col("lang") === "en")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .as[(Long, Seq[String])]
          .map { case (id, ts) =>
            val dist = ts.distinct
            (id, TextAlgs.lshBands(TextAlgs.minhash(dist)).toArray,
              dist.map(TextAlgs.tokenHash64).sorted.toArray)
          }.toDF("doc_id", "bands", "tokset")
          .persist()
        val bands = docFeats
          .select(col("doc_id"), size(col("tokset")).cast("long").as("sz"),
            explode(col("bands")).as("bh"))
          .select(col("doc_id"), col("sz"), col("bh._1").as("band"),
            col("bh._2").as("bhash"))
        // a near-dup pair collides in ~6 of the 16 bands on this corpus, so
        // the dedup shuffles ~5x the distinct pairs; packing (a,b) into ONE
        // long (doc_ids fit 32 bits) halves the shuffle width — measured
        // ~30% off the dominant stage at sf0.1.
        // The size-ratio bound prunes false candidates INSIDE the join
        // before they reach the pack/dedup shuffle: J(A,B) <= min/max, so
        // any pair with min*1e7 < max*7999995 has true J < 0.7999995 and
        // cannot round to >= 0.8 — exactness preserved (the spec pins
        // minhash pairs == exact-Jaccard pairs). ~48% of random pairs on
        // this corpus fail the bound; LSH-colliding false positives are
        // mostly chance collisions, so the prune concentrates there.
        // r15 note: round-robin-widening the probe side here (the
        // IncNeardup.candidates fix) was tried and REVERTED — measured
        // 4.30 s in one subset run but 5.51/4.90 s in the closing full
        // run and an idle-box recheck vs the 4.67 s r14 baseline: the
        // persisted-cache probe is already wide enough post-AQE on this
        // op, so the extra exchange is a wash-to-tax (OPTIMIZATION_r15).
        val cand = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bhash") === col("y.bhash") &&
              col("x.doc_id") < col("y.doc_id") &&
              col("x.sz") * 10000000L >= col("y.sz") * 7999995L &&
              col("y.sz") * 10000000L >= col("x.sz") * 7999995L)
          .select(graft.Pack.pair(col("x.doc_id"), col("y.doc_id")).as("pk"))
          .distinct()
          .select(graft.Pack.left(col("pk")).as("doc_a"),
            graft.Pack.right(col("pk")).as("doc_b"))
        // verify on the sorted 64-bit token hashes, not string sets: the
        // codegen'd merge-intersect (lixsize) replaces per-pair string
        // hashing — same Jaccard modulo 64-bit collisions (~1e-10 here)
        val sets = docFeats.select(col("doc_id"), col("tokset"))
        val result = cand
          .join(broadcast(sets.select(col("doc_id").as("doc_a"),
            col("tokset").as("set_a"))), "doc_a")
          .join(broadcast(sets.select(col("doc_id").as("doc_b"),
            col("tokset").as("set_b"))), "doc_b")
          .withColumn("inter", expr("lixsize(set_a, set_b)").cast("double"))
          .withColumn("jac",
            round(col("inter") / (size(col("set_a")) + size(col("set_b"))
              - col("inter")), 6))
          .filter(col("jac") >= 0.8)
          .select("doc_a", "doc_b", "jac")
        // materialize eagerly so the cache can be dropped before return
        // (no cache leak into later queries; same pattern as text_dedup_cc)
        val out = graft.Tmp.dir("graft_minhash")
        try result.write.mode("overwrite").parquet(out)
        finally docFeats.unpersist(blocking = false)
        s.read.parquet(out).orderBy("doc_a", "doc_b")
      },
      None
    ),
    Q(
      "text_simhash",
      // 64-bit SimHash fingerprints + near-dup candidates at hamming <= 8.
      (s, dir) => {
        import s.implicits._
        val sh = T(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .as[(Long, Seq[String])]
          .map { case (id, ts) => (id, TextAlgs.simhash(ts)) }
          .toDF("doc_id", "simhash")
        sh.orderBy("doc_id")
      },
      None
    ),
    Q(
      "text_fingerprint",
      // Content fingerprint: md5 over the sorted distinct token set —
      // identical across engines, unlike seeded rolling hashes.
      (s, dir) =>
        T(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(concat_ws(" ",
              array_sort(array_distinct(split(col("text"), " ")))))
              .as("fp"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, md5(array_to_string(list_sort(list_distinct(" +
          "string_split(text, ' '))), ' ')) AS fp FROM documents ORDER BY doc_id")
    ),
    Q(
      "text_quality",
      // Quality score: distinct-token ratio, stopword ratio, length factor.
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            split(col("text"), " ").as("toks"))
          .withColumn("n_toks", size(col("toks")).cast("double"))
          .withColumn("distinct_ratio",
            size(array_distinct(col("toks"))) / col("n_toks"))
          .withColumn("stop_ratio",
            size(expr("filter(toks, t -> t = 'the' OR t = 'a')"))
              / col("n_toks"))
          .select(
            col("doc_id"),
            col("lang"),
            round(col("distinct_ratio"), 6).as("distinct_ratio"),
            round(col("stop_ratio"), 6).as("stop_ratio"),
            round(
              lit(0.5) * col("distinct_ratio") +
                lit(0.3) * (lit(1.0) - col("stop_ratio")) +
                lit(0.2) * least(col("n_chars") / 500.0, lit(1.0)), 6)
              .as("quality"))
          .orderBy("doc_id"),
      Some(
        "WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks " +
          "FROM documents), " +
          "r AS (SELECT doc_id, lang, " +
          "CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio, " +
          "CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a')) AS DOUBLE) " +
          "/ len(toks) AS stop_ratio, n_chars FROM t) " +
          "SELECT doc_id, lang, round(distinct_ratio, 6) AS distinct_ratio, " +
          "round(stop_ratio, 6) AS stop_ratio, " +
          "round(0.5*distinct_ratio + 0.3*(1.0 - stop_ratio) + " +
          "0.2*least(n_chars/500.0, 1.0), 6) AS quality " +
          "FROM r ORDER BY doc_id")
    ),
    Q(
      "text_token_bpe",
      // BPE-ish regex tokenizer count (letters / digits / single symbol).
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("lang"),
            size(expr(
              "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
              .cast("long").as("n_bpe"))
          .groupBy("lang")
          .agg(
            sum("n_bpe").as("total_bpe"),
            round(avg(col("n_bpe").cast("double")), 4).as("avg_bpe"))
          .orderBy("lang"),
      Some(
        "WITH t AS (SELECT lang, CAST(len(regexp_extract_all(text, " +
          "'[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe FROM documents) " +
          "SELECT lang, CAST(sum(n_bpe) AS BIGINT) AS total_bpe, " +
          "round(avg(CAST(n_bpe AS DOUBLE)),4) AS avg_bpe " +
          "FROM t GROUP BY lang ORDER BY lang")
    ),
    Q(
      "text_lang_id",
      // Heuristic language ID (stopword markers + CJK ratio) via pure
      // expressions — langIdExpr above; no UDF anywhere in the plan. The
      // synthetic corpus shares one vocabulary across langs, so the
      // interesting assertions live in TextAlgsSpec on real multilingual
      // strings. The oracle restates the expression in DuckDB: per-lang
      // marker-hit counts, the fold's tie-break (lang-ascending, strict >)
      // as a CASE priority chain, and the CJK-ratio branch.
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            langIdExpr(col("text")).as("pred_lang"))
          .orderBy("doc_id"),
      Some(
        "WITH t AS (SELECT doc_id, lang, text, " +
          "regexp_split_to_array(lower(text), '\\s+') AS toks " +
          "FROM documents), " +
          "c AS (SELECT doc_id, lang, " +
          "len(list_filter(toks, x -> x IN ('der','die','das','und','ist'," +
          "'ein','mit','für','nicht'))) AS n_de, " +
          "len(list_filter(toks, x -> x IN ('the','and','of','to','is'," +
          "'with','that','for'))) AS n_en, " +
          "len(list_filter(toks, x -> x IN ('el','los','las','y','es'," +
          "'una','que','por','con'))) AS n_es, " +
          "len(list_filter(toks, x -> x IN ('le','la','les','et','de'," +
          "'est','une','que','pour'))) AS n_fr, " +
          "len(regexp_extract_all(text, '[\\x{4E00}-\\x{9FFF}" +
          "\\x{3400}-\\x{4DBF}\\x{F900}-\\x{FAFF}" +
          "\\x{20000}-\\x{2FA1F}]')) AS ncjk, " +
          "length(text) AS lc FROM t) " +
          "SELECT doc_id, lang, " +
          "CASE WHEN CAST(ncjk AS DOUBLE) > CAST(lc AS DOUBLE) * 0.2 " +
          "THEN 'zh' " +
          "WHEN greatest(n_de,n_en,n_es,n_fr) = 0 THEN 'en' " +
          "WHEN n_de = greatest(n_de,n_en,n_es,n_fr) THEN 'de' " +
          "WHEN n_en = greatest(n_de,n_en,n_es,n_fr) THEN 'en' " +
          "WHEN n_es = greatest(n_de,n_en,n_es,n_fr) THEN 'es' " +
          "ELSE 'fr' END AS pred_lang " +
          "FROM c ORDER BY doc_id")
    ),
    Q(
      "text_rolling_fp",
      // Order-sensitive rolling-hash fingerprint (seeded — no oracle).
      (s, dir) => {
        import s.implicits._
        T(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .as[(Long, Seq[String])]
          .map { case (id, ts) => (id, TextAlgs.rollingFingerprint(ts)) }
          .toDF("doc_id", "rolling_fp")
          .orderBy("doc_id")
      },
      None
    ),
    Q(
      "text_chunk",
      // document chunking — the pretraining tokenize-and-split pass:
      // 100-token chunks on an 80-token stride (20 overlap), each with a
      // content fingerprint. Pure per-row array arithmetic: embarrassingly
      // parallel, no shuffle until the final output sort.
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("tk"))
          .withColumn("n", size(col("tk")).cast("long"))
          .withColumn("pos", explode(expr(
            "sequence(0L, n - 1, 80L)")))
          .select(
            col("doc_id"),
            (col("pos") / 80).cast("long").as("chunk_idx"),
            least(lit(100L), col("n") - col("pos")).as("n_toks"),
            md5(expr("concat_ws(' ', slice(tk, CAST(pos + 1 AS INT), 100))"))
              .as("fp"))
          .orderBy("doc_id", "chunk_idx"),
      Some(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk " +
          "FROM documents), " +
          "c AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n, " +
          "unnest(range(0, CAST(len(tk) AS BIGINT), 80)) AS pos, tk FROM t) " +
          "SELECT doc_id, pos // 80 AS chunk_idx, " +
          "least(100, n - pos) AS n_toks, " +
          "md5(array_to_string(tk[CAST(pos+1 AS INT):CAST(pos+100 AS INT)], ' ')) " +
          "AS fp FROM c ORDER BY doc_id, chunk_idx")
    ),
    Q(
      "text_decontaminate",
      // test-set decontamination: train docs (src0) sharing any trigram
      // with the test corpus (src1), by shared-shingle count — shingles
      // are md5 of the joined window (portable, unseeded), the test-side
      // distinct set is small and broadcasts. The canonical eval-leakage
      // check run before every pretraining corpus ships.
      (s, dir) => {
        val sh = T(s, dir, "documents")
          .filter(col("lang") === "en")
          .select(col("doc_id"), col("source"),
            split(col("text"), " ").as("tk"))
          .select(col("doc_id"), col("source"), explode(expr(
            "CASE WHEN size(tk) >= 3 THEN transform(sequence(1, size(tk) - 2), " +
              "i -> md5(concat_ws(' ', slice(tk, i, 3)))) " +
              "ELSE array() END")).as("h"))
        val testSh = sh.filter(col("source") === "src1")
          .select("h").distinct()
        sh.filter(col("source") === "src0")
          .join(broadcast(testSh), "h")
          .groupBy("doc_id")
          .agg(countDistinct("h").as("n_shared"))
          .orderBy("doc_id")
      },
      Some(
        "WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS tk " +
          "FROM documents WHERE lang = 'en'), " +
          "sh AS (SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 3 " +
          "THEN list_transform(range(1, CAST(len(tk) AS BIGINT) - 1), " +
          "i -> md5(array_to_string(tk[CAST(i AS INT):CAST(i+2 AS INT)], ' '))) " +
          "ELSE [] END) AS h FROM tk), " +
          "test_sh AS (SELECT DISTINCT h FROM sh WHERE source = 'src1') " +
          "SELECT s.doc_id, CAST(count(DISTINCT s.h) AS BIGINT) AS n_shared " +
          "FROM sh s JOIN test_sh t ON s.h = t.h WHERE s.source = 'src0' " +
          "GROUP BY s.doc_id ORDER BY s.doc_id")
    ),
    Q(
      "text_token_budget",
      // token-budget sampling — the mixture-building primitive: take docs
      // per language in stable doc_id order until the 20k-token budget is
      // hit; report kept docs + tokens. One window + one aggregate.
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("doc_id")
        T(s, dir, "documents")
          .select(col("lang"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .withColumn("run", sum("toks").over(w))
          .filter(col("run") <= 20000)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("tokens"))
          .orderBy("lang")
      },
      Some(
        "WITH t AS (SELECT lang, doc_id, " +
          "CAST(len(string_split(text, ' ')) AS BIGINT) AS toks " +
          "FROM documents), " +
          "r AS (SELECT lang, doc_id, toks, sum(toks) OVER " +
          "(PARTITION BY lang ORDER BY doc_id) AS run FROM t) " +
          "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(toks) AS BIGINT) AS tokens FROM r WHERE run <= 20000 " +
          "GROUP BY lang ORDER BY lang")
    ),
    Q(
      "text_dedup_mllib_lsh",
      // The SAME near-dup problem through Spark MLlib's estimator API
      // (north star: "Structured Streaming + MLlib"): CountVectorizer →
      // MinHashLSH.approxSimilarityJoin, exact-Jaccard re-verified. Seeded
      // ⇒ deterministic; TextAlgsSpec asserts parity with the exact pairs.
      //
      // MEASURED LIMITATION (sf0.1): MLlib MinHashLSH amplifies OR-only
      // (one hash row per table, candidate if ANY table collides) — on
      // this shared-vocabulary corpus where typical non-dup pairs already
      // have Jaccard ~0.25, P(candidate) ≈ 1-(1-j)^16 ≈ 0.99, i.e. it
      // degenerates to the full quadratic join (102 s vs 2.6 s for our
      // banded text_dedup_minhash, whose 4-row AND bands give j^4 ≈ 0.004
      // per band). So this op runs on the same blocked slice as the exact
      // op; text_dedup_minhash remains the corpus-scale path.
      (s, dir) => {
        import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
        val docs = T(s, dir, "documents")
          .filter(col("lang") === "en" &&
            col("source").isin("src0", "src1"))
          .select(col("doc_id"),
            array_distinct(split(col("text"), " ")).as("toks"))
        val cv = new CountVectorizer()
          .setInputCol("toks").setOutputCol("features")
          .setBinary(true)
          .fit(docs)
        val feats = cv.transform(docs)
        // 8 tables (not 16): recall for j >= 0.8 is 1-(1-j)^8 ≈ 1-2.6e-6
        // — indistinguishable from 16 at any fixture SF (verified: row
        // counts identical) — while the hash-explode join halves
        val lsh = new MinHashLSH()
          .setInputCol("features").setOutputCol("hashes")
          .setNumHashTables(8).setSeed(42L)
          .fit(feats)
        lsh.approxSimilarityJoin(feats, feats, 0.2, "jacDist")
          .select(
            col("datasetA.doc_id").as("doc_a"),
            col("datasetB.doc_id").as("doc_b"))
          .filter(col("doc_a") < col("doc_b"))
          // LSH candidates only — re-verify with EXACT Jaccard >= 0.8 so
          // the result is hash-seed-independent
          .join(docs.select(col("doc_id").as("doc_a"),
            col("toks").as("ta")), "doc_a")
          .join(docs.select(col("doc_id").as("doc_b"),
            col("toks").as("tb")), "doc_b")
          .withColumn("inter",
            size(array_intersect(col("ta"), col("tb"))).cast("double"))
          .withColumn("jac", col("inter") /
            (size(col("ta")) + size(col("tb")) - col("inter")))
          .filter(col("jac") >= 0.8)
          .select(col("doc_a"), col("doc_b"),
            graft.Det.dround(col("jac"), 6).as("jac"))
          .distinct()
          .orderBy("doc_a", "doc_b")
      },
      None
    ),
    Q(
      "text_tfidf",
      // TF-IDF keyword extraction: top-3 terms per document. Three hash
      // aggregates (tf, df, doc counts) + two joins + one window — every
      // stage is a shuffle on a high-cardinality key, the canonical
      // keyword-pipeline shape at corpus scale. ln() ratios are rounded
      // via dround (identical IEEE ops on identical int-derived doubles).
      (s, dir) => {
        val toks = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
        val tf = toks.groupBy("doc_id", "lang", "tok")
          .agg(count(lit(1)).as("tf"))
        // df re-aggregates tf (one row per (doc,tok) already) — NOT a
        // second corpus scan+explode; halves the heaviest stage
        val df = tf.groupBy("lang", "tok")
          .agg(count(lit(1)).as("df"))
        val nd = T(s, dir, "documents")
          .groupBy("lang").agg(count(lit(1)).as("nd"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("tok"))
        tf.join(df, Seq("lang", "tok"))
          .join(nd, Seq("lang"))
          .withColumn("tfidf", graft.Det.dround(
            col("tf") * log(col("nd").cast("double") / col("df")), 6))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("doc_id", "rn", "tok", "tfidf")
          .orderBy("doc_id", "rn")
      },
      Some(
        "WITH tk AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) " +
          "AS tok FROM documents), " +
          "tf AS (SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS tf " +
          "FROM tk GROUP BY 1, 2, 3), " +
          "df AS (SELECT lang, tok, CAST(count(DISTINCT doc_id) AS BIGINT) " +
          "AS df FROM tk GROUP BY 1, 2), " +
          "nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd " +
          "FROM documents GROUP BY 1), " +
          "x AS (SELECT tf.doc_id, tf.tok, " +
          graft.Det.droundSql("tf.tf * ln(CAST(nd.nd AS DOUBLE) / df.df)", 6) +
          " AS tfidf FROM tf JOIN df ON tf.lang = df.lang AND tf.tok = df.tok " +
          "JOIN nd ON tf.lang = nd.lang), " +
          "r AS (SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id " +
          "ORDER BY tfidf DESC, tok) AS BIGINT) AS rn, tok, tfidf FROM x) " +
          "SELECT doc_id, rn, tok, tfidf FROM r WHERE rn <= 3 " +
          "ORDER BY doc_id, rn")
    ),
    Q(
      "text_ngram_freq",
      // bigram frequency: top-10 bigrams per language — n-gram statistics
      // for corpus analysis; one explode + one count + one small window
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang")
          .orderBy(col("cnt").desc, col("bigram"))
        T(s, dir, "documents")
          .select(col("lang"), split(col("text"), " ").as("tk"))
          .select(col("lang"), explode(expr(
            // adjacent-pair zip: zip_with pads the shorter side with null,
            // concat null-propagates, filter drops the padded tail pair
            "filter(zip_with(tk, slice(tk, 2, size(tk)), " +
              "(a, b) -> concat(a, ' ', b)), x -> x IS NOT NULL)"))
            .as("bigram"))
          .groupBy("lang", "bigram")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 10)
          .select("lang", "rn", "bigram", "cnt")
          .orderBy("lang", "rn")
      },
      Some(
        "WITH t AS (SELECT lang, string_split(text, ' ') AS tk " +
          "FROM documents), " +
          "bg AS (SELECT lang, unnest(list_transform(range(1, len(tk)), " +
          "i -> tk[i] || ' ' || tk[i+1])) AS bigram FROM t), " +
          "c AS (SELECT lang, bigram, CAST(count(*) AS BIGINT) AS cnt " +
          "FROM bg GROUP BY 1, 2), " +
          "r AS (SELECT lang, CAST(row_number() OVER (PARTITION BY lang " +
          "ORDER BY cnt DESC, bigram) AS BIGINT) AS rn, bigram, cnt FROM c) " +
          "SELECT lang, rn, bigram, cnt FROM r WHERE rn <= 10 " +
          "ORDER BY lang, rn")
    )
  )
}
