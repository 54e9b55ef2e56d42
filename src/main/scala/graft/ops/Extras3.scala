package graft.ops

import graft.{Q, QueryModule, StreamRun, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Round-3 engine-surface wave: sketch-backed top-k, URL parsing,
  * histogram bucketing, and state-store introspection.
  *
  * Scale notes: `approx_top_k` is a constant-size mergeable summary (the
  * heavy-hitters analog of the HLL/CMS family already shipped) — partials
  * merge on the exchange, no row shuffle. `stream_state_reader` is the ops
  * tool every long-running stateful pipeline needs: the checkpoint's state
  * store read back as a DataFrame, verified here against the batch answer
  * over the same input — state is DATA, not a black box.
  */
object Extras3 extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "agg_approx_topk",
      // approx_top_k heavy hitters. With 5 distinct values the sketch's
      // default capacity (10k tracked items) makes the counts EXACT, so
      // the op is oracle-checked against the exact group-count top-3 (no
      // tie at any fixture SF — verified; ordering key (n DESC, value)
      // is total either way).
      (s, dir) =>
        T(s, dir, "events")
          .select(expr("inline(approx_top_k(event_type, 3))"))
          .select(col("item").as("event_type"),
            col("count").as("n"))
          .orderBy(col("n").desc, col("event_type")),
      Some(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events " +
          "GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3")
    ),
    Q(
      "fn_url",
      // parse_url family over URLs derived from fixture fields; the oracle
      // reconstructs each component from the same fields, so the Spark
      // parser is checked against ground truth, not another parser.
      (s, dir) =>
        T(s, dir, "documents")
          .withColumn("url",
            concat(lit("https://"), col("source"), lit(".example.com/d/"),
              col("doc_id"), lit("?k="), pmod(col("doc_id"), lit(10))))
          .select(
            col("doc_id"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY"), lit("k")).as("k"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, source || '.example.com' AS host, " +
          "'/d/' || CAST(doc_id AS VARCHAR) AS path, " +
          "CAST(doc_id % 10 AS VARCHAR) AS k " +
          "FROM documents ORDER BY doc_id")
    ),
    Q(
      "fn_histogram",
      // width_bucket histogram of order totals: 12 equal buckets over
      // [0, 600k) plus the overflow bucket — the one-pass distribution
      // summary; the oracle mirrors the same half-open bucket arithmetic.
      (s, dir) =>
        T(s, dir, "orders")
          .select(width_bucket(col("o_totalprice"), lit(0), lit(600000),
            lit(12)).as("bucket"), col("o_totalprice"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))
          .orderBy("bucket"),
      Some(
        "SELECT CAST(least(floor(o_totalprice / 50000) + 1, 13) AS BIGINT) " +
          "AS bucket, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("o_totalprice", 2) + " AS total " +
          "FROM orders GROUP BY 1 ORDER BY bucket")
    ),
    Q(
      "source_csv_malformed",
      // Real-world ingestion: a CSV batch with a corrupt row, read in
      // PERMISSIVE mode with a corrupt-record column — the pipeline keeps
      // the good rows, counts the bad ones, and nothing throws. The oracle
      // states the clean-row aggregate from the same fixture slice plus
      // the known corrupt count.
      (s, dir) => {
        val tmp = graft.Tmp.dir("graft_csv_bad")
        T(s, dir, "orders")
          .filter(col("o_orderkey") <= 1000)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").option("header", "false").csv(tmp)
        // append one malformed line (non-numeric price)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(tmp, "part-zz-bad.csv"),
          "999999999,NOT_A_PRICE\n")
        val raw = s.read
          .schema("o_orderkey LONG, o_totalprice DOUBLE, _bad STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_bad")
          .csv(tmp)
        raw.agg(
          count(when(col("_bad").isNull, 1)).as("n_good"),
          count(col("_bad")).as("n_corrupt"),
          dsum(when(col("_bad").isNull, col("o_totalprice"))
            .otherwise(lit(0.0)), 2).as("total_good"))
      },
      Some(
        "SELECT CAST(count(*) AS BIGINT) AS n_good, " +
          "CAST(1 AS BIGINT) AS n_corrupt, " +
          dsumSql("o_totalprice", 2) + " AS total_good " +
          "FROM orders WHERE o_orderkey <= 1000")
    ),
    Q(
      "text_unigram_xent",
      // Unigram cross-entropy scoring — the model-free stand-in for
      // perplexity filtering: first pass builds the corpus unigram
      // distribution (a tiny aggregate that broadcasts), second pass
      // scores each document by the mean -ln p(token). Two scans, no
      // row shuffle beyond the per-token count.
      (s, dir) => {
        val toks = T(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        // corpus total via a global window over the (vocab-sized) grouped
        // frame — no separate count() action, so the corpus is tokenized
        // exactly twice (probs subtree + scoring side), not three times
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy()
        val probs = toks.groupBy("tok")
          .agg(count(lit(1)).as("cnt"))
          .select(col("tok"),
            (col("cnt") / sum("cnt").over(wAll).cast("double")).as("p"))
        toks.join(broadcast(probs), "tok")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_toks"),
            davg(-log(col("p")), 6).as("xent"))
          .orderBy("doc_id")
      },
      Some(
        "WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok " +
          "FROM documents), " +
          "tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tk), " +
          "pr AS (SELECT tok, count(*) / (SELECT t FROM tot) AS p " +
          "FROM tk GROUP BY tok) " +
          "SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_toks, " +
          davgSql("-ln(pr.p)", 6) + " AS xent " +
          "FROM tk JOIN pr ON tk.tok = pr.tok " +
          "GROUP BY tk.doc_id ORDER BY tk.doc_id")
    ),
    Q(
      "sub_not_in_null",
      // ANSI NOT IN null semantics — the classic correctness trap: one
      // NULL in the subquery makes NOT IN yield no rows (three-valued
      // logic), while the null-filtered form behaves like anti-join. Both
      // counts emitted side by side; engines must agree exactly.
      (s, dir) => {
        T(s, dir, "customer").createOrReplaceTempView("sub_nin_cust")
        T(s, dir, "orders").createOrReplaceTempView("sub_nin_ord")
        s.sql(
          "SELECT " +
            "(SELECT CAST(count(*) AS BIGINT) FROM sub_nin_cust WHERE " +
            "c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 100 = 0 " +
            "THEN NULL ELSE o_custkey END FROM sub_nin_ord)) AS with_null, " +
            "(SELECT CAST(count(*) AS BIGINT) FROM sub_nin_cust WHERE " +
            "c_custkey NOT IN (SELECT o_custkey FROM sub_nin_ord " +
            "WHERE o_custkey IS NOT NULL)) AS without_null")
      },
      Some(
        "SELECT " +
          "(SELECT CAST(count(*) AS BIGINT) FROM customer WHERE " +
          "c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 100 = 0 " +
          "THEN NULL ELSE o_custkey END FROM orders)) AS with_null, " +
          "(SELECT CAST(count(*) AS BIGINT) FROM customer WHERE " +
          "c_custkey NOT IN (SELECT o_custkey FROM orders " +
          "WHERE o_custkey IS NOT NULL)) AS without_null")
    ),
    Q(
      "fn_xml",
      // XML column handling: build an XML fragment from part fields,
      // parse it back with from_xml (schema-on-read) and xpath_string —
      // the oracle reconstructs the extracted values from the same fields.
      (s, dir) =>
        T(s, dir, "part")
          .withColumn("xml",
            concat(lit("<part><key>"), col("p_partkey"),
              lit("</key><brand>"), col("p_brand"),
              lit("</brand><size>"), col("p_size"), lit("</size></part>")))
          .select(
            col("p_partkey"),
            expr("from_xml(xml, 'key LONG, brand STRING, size INT')")
              .as("parsed"),
            expr("xpath_string(xml, '/part/brand')").as("brand_xp"))
          .select(
            col("p_partkey"),
            col("parsed.key").as("key"),
            col("parsed.brand").as("brand"),
            col("parsed.size").cast("long").as("sz"),
            col("brand_xp"))
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, p_partkey AS key, p_brand AS brand, " +
          "CAST(p_size AS BIGINT) AS sz, p_brand AS brand_xp " +
          "FROM part ORDER BY p_partkey")
    ),
    Q(
      "vec_pca_power",
      // Distributed PCA, top principal axis by power iteration: each round
      // is ONE treeAggregate producing a 64-long partial (Σ (x-μ)((x-μ)·v)
      // accumulates in constant size) — covariance never materializes and
      // nothing shuffles rows, the same constant-partial shape as the RC
      // readout's Gram accumulation. Every summation boundary (mean, the
      // per-row dot, the per-component accumulate, the norm square) lands
      // on a fixed integer grid BEFORE it is summed, so the whole 12-round
      // recurrence is associative integer arithmetic — immune to partial-
      // aggregation order AND bit-identical across engines, which is what
      // lets an iterative-linalg op carry a SQL oracle at all (the same
      // per-iteration-quantization trick as graph_pagerank; the oracle is
      // a generated 12-iteration CTE chain over the long-form matrix).
      // Start vector is the constant unit vector (1/8 per component, unit
      // 64-dim norm) — SQL-expressible, and convergence only needs a
      // nonzero overlap with the principal axis. Sign fixed by the
      // largest-magnitude component. Round3Spec pins the distributed
      // treeAggregate against an independent sequential driver loop on the
      // same grids — exact equality, not a tolerance.
      (s, dir) => {
        import s.implicits._
        val dim = 64
        val vecs = T(s, dir, "embeddings")
          .select(col("embedding"))
          .as[Seq[Float]]
          .map(_.map(_.toDouble).toArray)
          .persist()
        val n = vecs.count()
        // quantized mean: per-component integer sums on the 1e8 grid
        val msum = vecs.rdd.treeAggregate(new Array[Long](dim))(
          (z, x) => {
            var i = 0
            while (i < dim) { z(i) += PcaQ.rz(x(i) * 1e8); i += 1 }
            z
          },
          (a, b) => { var i = 0; while (i < dim) { a(i) += b(i); i += 1 }; a })
        val mu = msum.map(_ / (1e8 * n))
        val bc = s.sparkContext.broadcast(mu)
        var v = Array.fill(dim)(0.125)
        var norm = 0.0
        (1 to 12).foreach { _ =>
          val bv = s.sparkContext.broadcast(v)
          val acc = vecs.rdd.treeAggregate(new Array[Long](dim))(
            (z, x) => {
              val m = bc.value; val vv = bv.value
              // per-row dot on the 1e9 grid (summed as longs, so the
              // j-order inside the row cannot matter either)
              var dq = 0L
              var i = 0
              while (i < dim) {
                dq += PcaQ.rz((x(i) - m(i)) * vv(i) * 1e9); i += 1
              }
              val d = dq / 1e9
              i = 0
              while (i < dim) {
                z(i) += PcaQ.rz((x(i) - m(i)) * d * 1e8); i += 1
              }
              z
            },
            (a, b) => { var i = 0; while (i < dim) { a(i) += b(i); i += 1 }; a })
          val q = acc.map(sv => PcaQ.rz((sv / 1e8) * (sv / 1e8) * 1e9)).sum
          norm = math.sqrt(q / 1e9)
          v = acc.map(sv => (sv / 1e8) / norm)
        }
        vecs.unpersist(blocking = false)
        // eigenvector sign is arbitrary: fix it by the largest component
        val piv = v.indices.maxBy(i => math.abs(v(i)))
        val sign = if (v(piv) < 0) -1.0 else 1.0
        val lam = PcaQ.rz(norm / n * 1e4) / 1e4
        val out = (0 until 8).map { i =>
          (i.toLong, PcaQ.rz(v(i) * sign * 1e6) / 1e6, lam)
        }
        s.createDataset(out).toDF("component", "loading", "eigenvalue")
          .orderBy("component")
      },
      Some(PcaQ.oracleSql)
    ),
    Q(
      "fn_variant",
      // Spark 4 VARIANT ingestion: parse_json once into the binary
      // variant encoding, then typed variant_get extraction — the
      // open-schema path for semi-structured columns (vs the fixed-schema
      // from_json). Oracle extracts the same values with DuckDB's JSON
      // functions; per-parity aggregate keeps the output compact.
      (s, dir) =>
        T(s, dir, "events")
          .select(col("event_id"),
            expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
          .groupBy(pmod(col("k"), lit(7)).as("k_mod7"))
          .agg(count(lit(1)).as("n"),
            min("event_id").as("first_id"),
            sum("k").as("sum_k"))
          .orderBy("k_mod7"),
      Some(
        // ((k % 7) + 7) % 7 == Spark's pmod for any sign of k — DuckDB's
        // bare % is sign-preserving, so parity must not depend on the
        // fixture happening to keep k non-negative
        "SELECT ((CAST(json_extract(props, '$.k') AS BIGINT) % 7) + 7) % 7 " +
          "AS k_mod7, " +
          "CAST(count(*) AS BIGINT) AS n, min(event_id) AS first_id, " +
          "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) " +
          "AS sum_k FROM events GROUP BY 1 ORDER BY k_mod7")
    ),
    Q(
      "join_dpp",
      // DYNAMIC partition pruning: the fact table is laid out partitioned
      // by priority; the dim-side filter is only known at runtime, and
      // Catalyst injects a dynamicpruning subquery so the fact scan reads
      // ONLY the partitions matching the filtered dim — the second-line
      // data-skipping mechanism after static pruning (Round3Spec asserts
      // `dynamicpruning` in the fact scan's partition filters). At 100 TB
      // this is what keeps a date-partitioned fact join from scanning
      // every date.
      (s, dir) => {
        val base = graft.Tmp.dir("graft_dpp")
        T(s, dir, "orders")
          .write.mode("overwrite")
          .partitionBy("o_orderpriority")
          .parquet(base)
        val fact = s.read.parquet(base)
        // tiny priority dim built from the same fixture; the filter
        // selects 2 of 5 partitions and is only resolvable at runtime
        val dim = T(s, dir, "orders")
          .select(col("o_orderpriority").as("pri")).distinct()
          .withColumn("urgent",
            col("pri").isin("1-URGENT", "2-HIGH"))
          .filter(col("urgent"))
        fact.join(dim, fact("o_orderpriority") === dim("pri"))
          .groupBy("pri")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))
          .orderBy("pri")
      },
      Some(
        "SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("o_totalprice", 2) + " AS total FROM orders " +
          "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') " +
          "GROUP BY 1 ORDER BY pri")
    ),
    Q(
      "sql_window_clause",
      // Pure-SQL named-WINDOW surface: one WINDOW definition shared by
      // three window functions — proves the ANSI WINDOW clause next to
      // the DataFrame API (same SQL text runs on both engines).
      (s, dir) => {
        T(s, dir, "orders").createOrReplaceTempView("sql_winc_orders")
        s.sql(
          "SELECT o_orderkey, o_custkey, " +
            "CAST(rank() OVER w AS BIGINT) AS rk, " +
            "CAST(count(*) OVER w AS BIGINT) AS n_so_far, " +
            "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER w " +
            "AS DOUBLE) / 100.0 AS run_total " +
            "FROM sql_winc_orders " +
            "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, " +
            "o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
            "ORDER BY o_orderkey")
      },
      Some(
        "SELECT o_orderkey, o_custkey, " +
          "CAST(rank() OVER w AS BIGINT) AS rk, " +
          "CAST(count(*) OVER w AS BIGINT) AS n_so_far, " +
          "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER w " +
          "AS DOUBLE) / 100.0 AS run_total " +
          "FROM orders " +
          "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, " +
          "o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
          "ORDER BY o_orderkey")
    ),
    Q(
      "stream_state_reader",
      // State-store introspection: run the windowless streaming count with
      // an explicit checkpoint, then read the checkpoint's STATE STORE as
      // a DataFrame (statestore source) — the per-key state must equal the
      // batch aggregate over the same input. Exactly-once made auditable.
      (s, dir) => {
        val ck = graft.Tmp.dir("graft_ck_ssr")
        StreamRun.withStateParts(s) {
          val q = EventOps.liveEvents(s, dir)
            .groupBy("event_type")
            .agg(count(lit(1)).as("n"))
            .writeStream.format("memory")
            .queryName(s"ssr_${System.nanoTime()}")
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.read.format("statestore").load(ck)
          .select(col("key.event_type").as("event_type"),
            col("value.count").as("n"))
          .orderBy("event_type")
      },
      Some(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events " +
          "GROUP BY event_type ORDER BY event_type")
    )
  )
}

/** Quantization contract shared by `vec_pca_power`'s Spark side, its
  * sequential test reference, and its generated DuckDB oracle. The single
  * invariant: any value that is about to be SUMMED is first rounded
  * half-away-from-zero onto a fixed integer grid, so every sum is
  * associative 64-bit integer arithmetic and both engines (and any
  * executor-partial order) produce the same bits. Grids: mean 1e8, per-row
  * dot 1e9, component accumulate 1e8, norm square 1e9 — chosen so the
  * largest sum (n · max|term|) stays far below 2^63 at any fixture SF and
  * the 1e-8 grid noise sits two decades under the 1e-6 output rounding.
  */
object PcaQ {
  /** round half-away-from-zero — matches DuckDB/Spark scale-0 `round` on
    * identical doubles (Math.round alone is half-UP: -2.5 → -2, wrong).
    */
  def rz(x: Double): Long =
    if (x < 0) -math.round(-x) else math.round(x)

  /** 12 unrolled power iterations over the long-form (i, j, xc) matrix.
    * Each iteration mirrors the Spark side expression-for-expression:
    * d_i = Σ_j ⌊xc·v_j·1e9⌉ / 1e9, a_j = Σ_i ⌊xc·d_i·1e8⌉,
    * ‖a‖² = Σ_j ⌊(a_j/1e8)²·1e9⌉, v'_j = (a_j/1e8) / √(‖a‖²/1e9).
    */
  def oracleSql: String = {
    val base =
      "WITH nn AS (SELECT count(*) AS n FROM embeddings), " +
        "mt0 AS MATERIALIZED (SELECT vec_id AS i, j, CAST(embedding[j] AS DOUBLE) AS x " +
        "FROM embeddings, generate_series(1, 64) AS g(j)), " +
        "mu AS MATERIALIZED (SELECT j, sum(CAST(round(x * 1e8) AS BIGINT)) AS ms " +
        "FROM mt0 GROUP BY j), " +
        "mt AS MATERIALIZED (SELECT i, mt0.j, x - ms / (1e8 * (SELECT n FROM nn)) AS xc " +
        "FROM mt0 JOIN mu ON mt0.j = mu.j), " +
        "v0 AS MATERIALIZED (SELECT j, 0.125 AS vj FROM generate_series(1, 64) AS g(j)), "
    val iters = (1 to 12).map { k =>
      s"d$k AS MATERIALIZED (SELECT i, sum(CAST(round(xc * vj * 1e9) AS BIGINT)) AS dq " +
        s"FROM mt JOIN v${k - 1} USING (j) GROUP BY i), " +
        s"a$k AS MATERIALIZED (SELECT j, sum(CAST(round(xc * (dq / 1e9) * 1e8) " +
        s"AS BIGINT)) AS s2 FROM mt JOIN d$k USING (i) GROUP BY j), " +
        s"n$k AS MATERIALIZED (SELECT sum(CAST(round((s2 / 1e8) * (s2 / 1e8) * 1e9) " +
        s"AS BIGINT)) AS q FROM a$k), " +
        s"v$k AS MATERIALIZED (SELECT j, (s2 / 1e8) / sqrt(q / 1e9) AS vj " +
        s"FROM a$k, n$k)"
    }.mkString(", ")
    base + iters + ", " +
      "piv AS (SELECT CASE WHEN vj < 0 THEN -1.0 ELSE 1.0 END AS sgn " +
      "FROM v12 ORDER BY abs(vj) DESC, j LIMIT 1), " +
      "lam AS (SELECT round(sqrt(q / 1e9) / (SELECT n FROM nn) * 1e4) " +
      "/ 1e4 AS ev FROM n12) " +
      "SELECT CAST(j - 1 AS BIGINT) AS component, " +
      "round(vj * sgn * 1e6) / 1e6 AS loading, ev AS eigenvalue " +
      "FROM v12, piv, lam WHERE j <= 8 ORDER BY component"
  }
}
