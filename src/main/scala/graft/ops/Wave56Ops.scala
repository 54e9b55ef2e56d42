package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Round-10 wave 56: classifier training/eval + tokenizer economics.
  *
  *  - `ml_logreg_irls`: logistic regression (intercept + one integer
  *    feature) trained by THREE Newton/IRLS steps, each ONE aggregate of
  *    quantized sufficient statistics — the "train at 100 TB in k
  *    shuffles" shape next to ml_ols_normal_eq's one-shot solve. Per-row
  *    sigmoid outputs land on fixed integer grids (1e6 for the gradient,
  *    1e4 for the Hessian — the coarser grid keeps Σ p(1−p)·q² inside
  *    int64 at 600k rows and scales to ~1e9 rows before DECIMAL), so
  *    every cross-row sum is an exact integer in BOTH engines; the 2×2
  *    Newton solve is the same closed-form double expression on both
  *    sides. The feature (l_quantity) takes ≤50 integer values, so the
  *    sigmoid is evaluated on a tiny, collision-safe argument set.
  *  - `ml_gains_table`: decile gains/lift for a scored binary outcome —
  *    rank by score (ties by key: total order), bucket by rank (exact
  *    integer arithmetic, not ntile), cumulative capture + lift per
  *    decile. The standard campaign-targeting readout; one sort-free
  *    rank window + one 10-row aggregate.
  *  - `vec_incremental_semdedup`: snapshot-incremental SEMANTIC dedup —
  *    batch 1 builds the cell index once, batch 2 probes only its own
  *    cells against broadcast centroids; the embedding analog of
  *    data_incremental_neardup, fully oracle-checked (deterministic).
  *  - `data_tokenizer_fertility`: per-language tokenizer economics —
  *    BPE-ish tokens per whitespace word (fertility) and bytes per
  *    token, the numbers that decide tokenizer/vocab choices for a
  *    training corpus. Exact integer sums, two rounded divisions.
  */
object Wave56Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "ml_logreg_irls",
      (s, dir) => {
        val rows = T(s, dir, "lineitem")
          .select(col("l_quantity").cast("long").as("q"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        // one aggregate per Newton step: exact integer sufficient stats
        // on the (1e6 gradient / 1e4 Hessian) grids
        def step(w0: Double, w1: Double): (Double, Double) = {
          val z = dround(lit(w0) + lit(w1) * col("q"), 6)
          val p6 = round(lit(1e6) / (lit(1.0) + exp(-z))).cast("long")
          val p4 = round(lit(1e4) / (lit(1.0) + exp(-z))).cast("long")
          val r = rows.withColumn("p6", p6).withColumn("p4", p4)
            .agg(
              sum(col("y") * 1000000L - col("p6")).as("g0"),
              sum((col("y") * 1000000L - col("p6")) * col("q")).as("g1"),
              sum(col("p4") * (lit(10000L) - col("p4"))).as("h00"),
              sum(col("p4") * (lit(10000L) - col("p4")) * col("q"))
                .as("h01"),
              sum(col("p4") * (lit(10000L) - col("p4")) * col("q") *
                col("q")).as("h11"))
            .first()
          val g0 = r.getLong(0) / 1e6; val g1 = r.getLong(1) / 1e6
          val h00 = r.getLong(2) / 1e8; val h01 = r.getLong(3) / 1e8
          val h11 = r.getLong(4) / 1e8
          val det = h00 * h11 - h01 * h01
          (w0 + (g0 * h11 - g1 * h01) / det,
            w1 + (h00 * g1 - h01 * g0) / det)
        }
        val (w0a, w1a) = step(0.0, 0.0)
        val (w0b, w1b) = step(w0a, w1a)
        val (w0c, w1c) = step(w0b, w1b)
        // holdout-free training accuracy at the 0.5 threshold: predict 1
        // iff z > 0 (sigmoid monotone — no exp needed in the verdict)
        rows.agg(
            count(lit(1)).as("n"),
            sum(when((lit(w0c) + lit(w1c) * col("q") > 0.0)
              .cast("long") === col("y"), 1L).otherwise(0L)).as("correct"))
          .select(col("n"),
            lit(dround6(w0c)).as("beta0"), lit(dround6(w1c)).as("beta1"),
            dround(col("correct").cast("double") / col("n"), 6)
              .as("accuracy"))
      },
      Some {
        // the same three steps as chained CTEs; each stepK exposes the
        // post-step (w0, w1) and the next step's stats read them via
        // scalar subqueries. Double expressions are textually identical
        // to the Scala ones, so IEEE evaluation matches bit-for-bit.
        val base = "WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS q, " +
          "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y " +
          "FROM lineitem), "
        def stats(wPrev: String, name: String): String = {
          // the 1-row weight CTE rides along as a CROSS JOIN + GROUP BY
          // (scalar subqueries here made DuckDB re-evaluate the whole
          // upstream chain per row — exponential in steps); z is
          // parenthesized EXACTLY like the Scala dround(w0 + w1*q, 6):
          // (a + b*q) * 1e6, not a*1e6 + b*q*1e6 — IEEE results differ
          val z = "round((w0 + w1 * q) * 1e6) / 1e6"
          s"${name}_s AS (SELECT w0, w1, " +
            s"CAST(sum(y * 1000000 - CAST(round(1e6 / (1.0 + exp(-($z)))) AS BIGINT)) AS BIGINT) AS g0, " +
            s"CAST(sum((y * 1000000 - CAST(round(1e6 / (1.0 + exp(-($z)))) AS BIGINT)) * q) AS BIGINT) AS g1, " +
            s"CAST(sum(CAST(round(1e4 / (1.0 + exp(-($z)))) AS BIGINT) * (10000 - CAST(round(1e4 / (1.0 + exp(-($z)))) AS BIGINT))) AS BIGINT) AS h00, " +
            s"CAST(sum(CAST(round(1e4 / (1.0 + exp(-($z)))) AS BIGINT) * (10000 - CAST(round(1e4 / (1.0 + exp(-($z)))) AS BIGINT)) * q) AS BIGINT) AS h01, " +
            s"CAST(sum(CAST(round(1e4 / (1.0 + exp(-($z)))) AS BIGINT) * (10000 - CAST(round(1e4 / (1.0 + exp(-($z)))) AS BIGINT)) * q * q) AS BIGINT) AS h11 " +
            s"FROM r, $wPrev GROUP BY w0, w1), " +
            s"$name AS (SELECT w0 + " +
            "((g0 / 1e6) * (h11 / 1e8) - (g1 / 1e6) * (h01 / 1e8)) / " +
            "((h00 / 1e8) * (h11 / 1e8) - (h01 / 1e8) * (h01 / 1e8)) AS w0, " +
            "w1 + " +
            "((h00 / 1e8) * (g1 / 1e6) - (h01 / 1e8) * (g0 / 1e6)) / " +
            "((h00 / 1e8) * (h11 / 1e8) - (h01 / 1e8) * (h01 / 1e8)) AS w1 " +
            s"FROM ${name}_s), "
        }
        base + "w_0 AS (SELECT 0.0 AS w0, 0.0 AS w1), " +
          stats("w_0", "w_1") + stats("w_1", "w_2") + stats("w_2", "w_3") +
          "acc AS (SELECT w0, w1, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CASE WHEN (CASE WHEN w0 + w1 * q > 0.0 " +
          "THEN 1 ELSE 0 END) = y " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS correct " +
          "FROM r, w_3 GROUP BY w0, w1) " +
          "SELECT n, " +
          droundSql("w0", 6) + " AS beta0, " +
          droundSql("w1", 6) + " AS beta1, " +
          droundSql("CAST(correct AS DOUBLE) / n", 6) + " AS accuracy " +
          "FROM acc"
      }
    ),
    Q(
      "ml_gains_table",
      // decile gains: score = order value (the "model"), outcome =
      // urgent priority. rank DESC with key tie-break = total order;
      // decile = (rank-1)*10/n (integer arithmetic — ntile's remainder
      // spreading differs between engines, this doesn't). Distinct from
      // stats_lift_table (Wave21: per-decile lift of a quality score vs
      // dup-rate, percentile-cutpoint buckets): this is the CUMULATIVE
      // gains curve on rank-exact deciles — the campaign-targeting
      // readout, where the running capture fraction is the point.
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("okey"))
        val scored = T(s, dir, "orders")
          .select(col("o_orderkey").as("okey"),
            round(col("o_totalprice") * 100).cast("long").as("score"),
            when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
              .as("y"))
          .withColumn("rk", row_number().over(w).cast("long"))
        val n = scored.agg(count(lit(1))).first().getLong(0)
        // floor, not cast: Spark's cast-to-long truncates but DuckDB's
        // CAST rounds — floor/`//` agree (operands positive, quotient of
        // exactly-divisible doubles is exact, so boundaries are safe)
        val dec = scored
          .withColumn("decile",
            floor((col("rk") - 1) * 10 / n).cast("long"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_rows"), sum("y").as("n_pos"))
        val wc = org.apache.spark.sql.expressions.Window
          .orderBy("decile")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val tot = dec.agg(sum("n_pos").as("total_pos"),
          sum("n_rows").as("total_n"))
        dec.crossJoin(broadcast(tot))
          .select(col("decile"), col("n_rows"), col("n_pos"),
            dround(sum(col("n_pos")).over(wc).cast("double") /
              col("total_pos"), 6).as("cum_gain"),
            dround(col("n_pos") * col("total_n").cast("double") /
              (col("n_rows") * col("total_pos")), 6).as("lift"))
          .orderBy("decile")
      },
      Some(
        "WITH sc AS (SELECT o_orderkey AS okey, " +
          "CAST(round(o_totalprice * 100) AS BIGINT) AS score, " +
          "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y " +
          "FROM orders), " +
          "rk AS (SELECT y, CAST(row_number() OVER (ORDER BY score DESC, " +
          "okey) AS BIGINT) AS rk FROM sc), " +
          "d AS (SELECT CAST((rk - 1) * 10 // (SELECT count(*) FROM sc) " +
          "AS BIGINT) AS decile, CAST(count(*) AS BIGINT) AS n_rows, " +
          "CAST(sum(y) AS BIGINT) AS n_pos FROM rk GROUP BY 1), " +
          "t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS total_pos, " +
          "CAST(sum(n_rows) AS BIGINT) AS total_n FROM d) " +
          "SELECT decile, n_rows, n_pos, " +
          droundSql("CAST(sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN " +
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / total_pos",
            6) + " AS cum_gain, " +
          droundSql("n_pos * CAST(total_n AS DOUBLE) / " +
            "(n_rows * total_pos)", 6) + " AS lift " +
          "FROM d, t ORDER BY decile")
    ),
    Q(
      "vec_incremental_semdedup",
      // Snapshot-incremental SEMANTIC dedup — the embedding analog of
      // data_incremental_neardup, at the full 3-commit cadence
      // (VERDICT-r11 #2): batch 1 builds the cell index ONCE (⌈√n⌉
      // lowest-id centroids, integer-grid geometry, SnapTable clustered
      // by cell); batch 2 probes it and is then ABSORBED atomically
      // with its corpus slice (one SnapTxn commit — index version ==
      // corpus version, frozen routing geometry); batch 3 probes the
      // b1 ∪ b2 union — per-batch cost O(|batch|·√n + matching
      // cells), never a corpus re-scan or index rebuild. Sizing is
      // footer-only (density-proven, zero Spark jobs). Deterministic
      // end-to-end (unlike the MinHash twin), so the whole incremental
      // pipeline — both probes, across the absorb — is oracle-checked.
      (s, dir) => incSemdedupBody(s, dir),
      Some {
        def assign(b: String) =
          s"$b AS (SELECT vec_id, g, (SELECT cid FROM c ORDER BY " +
            s"list_sum(list_transform(list_zip(${b.replace("a", "b")}.g, " +
            "c.cg), p -> (p[1] - p[2]) * (p[1] - p[2]))), cid LIMIT 1) " +
            s"AS cell FROM ${b.replace("a", "b")}), "
        def dups(name: String, nw: String, old: String) =
          s"$name AS (SELECT DISTINCT $nw.vec_id FROM $nw JOIN $old " +
            s"ON $nw.cell = $old.cell AND round(list_sum(list_transform(" +
            s"list_zip($nw.g, $old.g), p -> p[1] * p[2])) / sqrt(" +
            s"CAST(list_sum(list_transform($nw.g, x -> x * x)) " +
            "AS DOUBLE) * " +
            s"CAST(list_sum(list_transform($old.g, x -> x * x)) " +
            "AS DOUBLE)) * 1e9) / 1e9 > 0.3), "
        def agg(name: String, b: String, a: String, d: String) =
          s"$name AS (SELECT CAST($b AS BIGINT) AS batch, $a.cell, " +
            "CAST(count(*) AS BIGINT) AS n_new, " +
            s"CAST(sum(CASE WHEN $d.vec_id IS NOT NULL THEN 1 ELSE 0 " +
            s"END) AS BIGINT) AS n_dup FROM $a LEFT JOIN $d " +
            s"ON $a.vec_id = $d.vec_id GROUP BY $a.cell)"
        "WITH g AS (SELECT vec_id, list_transform(embedding, " +
          "x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS g " +
          "FROM embeddings), " +
          "b1 AS (SELECT * FROM g WHERE vec_id % 3 = 0), " +
          "b2 AS (SELECT * FROM g WHERE vec_id % 3 = 1), " +
          "b3 AS (SELECT * FROM g WHERE vec_id % 3 = 2), " +
          "kk AS (SELECT LEAST(65536, GREATEST(1, CAST(ceil(sqrt(" +
          "CAST((SELECT count(*) FROM b1) AS DOUBLE))) AS BIGINT))) " +
          "AS k), " +
          "c AS (SELECT vec_id AS cid, g AS cg FROM b1 " +
          "WHERE vec_id < 3 * (SELECT k FROM kk)), " +
          assign("a1") + assign("a2") + assign("a3") +
          // the absorbed index batch 3 probes: batch 1 plus batch 2
          "au AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2), " +
          dups("d2", "a2", "a1") + dups("d3", "a3", "au") +
          agg("r2", "2", "a2", "d2") + ", " + agg("r3", "3", "a3", "d3") +
          " SELECT batch, cell, n_new, n_dup FROM " +
          "(SELECT * FROM r2 UNION ALL SELECT * FROM r3) " +
          "ORDER BY batch, cell"
      }
    ),
    Q(
      "data_tokenizer_fertility",
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("lang"),
            octet_length(col("text")).cast("long").as("bytes"),
            size(expr(
              "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
              .cast("long").as("bpe"),
            size(split(col("text"), " ")).cast("long").as("words"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("bytes").as("total_bytes"),
            sum("bpe").as("total_tokens"), sum("words").as("total_words"))
          .select(col("lang"), col("n_docs"), col("total_tokens"),
            dround(col("total_tokens").cast("double") /
              col("total_words"), 6).as("fertility"),
            dround(col("total_bytes").cast("double") /
              col("total_tokens"), 6).as("bytes_per_token"))
          .orderBy("lang"),
      Some(
        "WITH t AS (SELECT lang, CAST(strlen(text) AS BIGINT) AS bytes, " +
          "CAST(len(regexp_extract_all(text, " +
          "'[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe, " +
          "CAST(len(string_split(text, ' ')) AS BIGINT) AS words " +
          "FROM documents) " +
          "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(bpe) AS BIGINT) AS total_tokens, " +
          droundSql("CAST(sum(bpe) AS DOUBLE) / sum(words)", 6) +
          " AS fertility, " +
          droundSql("CAST(sum(bytes) AS DOUBLE) / sum(bpe)", 6) +
          " AS bytes_per_token FROM t GROUP BY lang ORDER BY lang")
    )
  )

  /** vec_incremental_semdedup body, cap-parameterized so CellSplitSpec
    * can force the two-level routing path (VERDICT-r10 #1).
    *
    * THREE-batch cadence (VERDICT-r11 #2): batch 1 builds the cell
    * index (a SnapTable, files range-clustered by coarse cell); batch 2
    * probes it, then corpus slice + index rows are ABSORBED in one
    * SnapTxn transaction (index version == corpus version — never a
    * rebuild, never a torn commit); batch 3 probes the b1 ∪ b2 union
    * through the tx pins. Routing geometry is
    * FROZEN from batch 1 (broadcast centroids and, when the second
    * layer is engaged, batch-1 sub-centroids) — an incremental batch
    * must never derive its own geometry, or identical vectors committed
    * in different batches would land in different cells. Per-commit
    * cost stays O(|batch|·√n + matching cells); the corpus is never
    * re-scanned (IvfAbsorbSpec pins it by job-group accounting).
    *
    * Batch sizing is footer-derived with ZERO Spark jobs
    * (VERDICT-r11 #7): footer column stats confirm vec_id spans
    * [0, n−1] with no nulls (the table's unique-dense-key contract,
    * which min/max/count cannot prove alone — see the in-body note),
    * so the residue-class batch sizes are exact arithmetic —
    * |b1| = ⌈n/3⌉.
    *
    * At the default cap fixture sizes give `sub == 1` and all batches
    * stay on the proven single-level plan. */
  private[graft] def incSemdedupBody(s: org.apache.spark.sql.SparkSession,
      dir: String,
      cap: Long = graft.vec.VecAlgs.BroadcastCellCap,
      // spec hook: a fixed tx root lets IvfAbsorbSpec assert the absorb
      // is an atomic APPEND pinned to the corpus version (file superset,
      // lockstep pins), never a rebuild
      txrootOverride: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    val gridded = T(s, dir, "embeddings")
      .select(col("vec_id"),
        expr(graft.vec.VecAlgs.GridExpr).as("g"))
    val b1 = gridded.filter(col("vec_id") % 3 === 0)
    val b2 = gridded.filter(col("vec_id") % 3 === 1)
    val b3 = gridded.filter(col("vec_id") % 3 === 2)
    val n = T.rows(s, dir, "embeddings")
    val (idLo, idHi) = graft.sources.ParquetMeta.longStats(
      s, s"$dir/embeddings.parquet", "vec_id")
    // CONSISTENCY CHECK of the table's declared contract (vec_id is the
    // table's unique dense key — TESTDATA schema): n non-null rows
    // spanning exactly [0, n-1]. Together with uniqueness (the key
    // contract — NOT provable from min/max/count alone: [0,0,2] also
    // spans [0,2]) this makes the %3 slice sizes exact arithmetic. The
    // check catches the realistic violations (offset/truncated/shifted
    // id ranges, null ids via longStats' zero-null requirement) and
    // fails fast instead of silently mis-sizing k.
    require(idLo == 0L && idHi == n - 1,
      s"vec_id not spanning 0..${n - 1} (stats [$idLo, $idHi]) — " +
        "footer-derived batch sizing would be wrong; use count()")
    val (k, sub) = graft.vec.VecAlgs.cellSplit((n + 2) / 3, cap)
    // k lowest-id batch-1 members: batch 1 holds ids ≡ 0 (mod 3), so
    // the first k of them are exactly the multiples of 3 below 3k
    val cents = b1.filter(col("vec_id") < 3 * k)
      .select(col("vec_id").as("cid"), col("g").as("cg"))
    val c1 = graft.vec.IvfRouting.assignCoarse(b1, cents)
    val c2 = graft.vec.IvfRouting.assignCoarse(b2, cents)
    val c3 = graft.vec.IvfRouting.assignCoarse(b3, cents)
    val cols = Seq(col("vec_id"), col("cell"), col("scell"), col("g"))
    // BUILD the index from f1 as a SnapTable (files range-clustered by
    // the coarse cell — per-file min/max stats prune on it); each
    // commit probes ONLY its own fine cells (exact cosine within the
    // cell), gets pinned eagerly, and is then ABSORBED in one SnapTxn
    // transaction together with its corpus slice — index version ==
    // corpus version by construction (the same ACID contract as
    // data_incremental_neardup's text index), a crash mid-absorb
    // leaves only unpinned orphans, and the next commit probes the
    // union without any rebuild. Probes read through the tx pins
    // (version-pinned manifests), so an in-flight absorb can never
    // leak into a running probe.
    def pipeline(f1: org.apache.spark.sql.DataFrame,
        f2: org.apache.spark.sql.DataFrame,
        f3: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      import graft.sources.{SnapTable, SnapTxn}
      val txroot =
        txrootOverride.getOrElse(graft.Tmp.dir("graft_incsem_tx"))
      val outDir = graft.Tmp.dir("graft_incsem_probe")
      SnapTable.create(s, s"$txroot/corpus", b1, "vec_id")
      SnapTable.create(s, s"$txroot/index", f1, "vec_id",
        spec = Seq("cell"))
      SnapTxn.init(txroot, Seq("corpus", "index"))
      def probe(fNew: org.apache.spark.sql.DataFrame, batch: Long)
          : Unit = {
        val idx = SnapTxn.read(s, txroot, "index")
          .select(col("cell"), col("scell"), col("vec_id").as("old_id"),
            col("g").as("og"))
        val dups = fNew.join(idx, Seq("cell", "scell"))
          .withColumn("dot", expr(
            "aggregate(zip_with(g, og, (a, b) -> a * b), " +
              "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
          .withColumn("n2n", expr(
            "aggregate(g, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
          .withColumn("n2o", expr(
            "aggregate(og, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
          .withColumn("cos", round(col("dot") /
            sqrt(col("n2n").cast("double") * col("n2o").cast("double"))
            * 1e9) / 1e9)
          .filter(col("cos") > 0.3)
          .select(col("vec_id")).distinct()
        // eager pin BEFORE the absorb touches idxDir: the probe must
        // see exactly the pre-absorb index (relying on the reader's
        // file-listing snapshot is non-contractual — the round-11
        // IncNeardup lesson), and the bench's timed path must pay the
        // probe cost
        fNew.join(dups.withColumn("dup", lit(1L)), Seq("vec_id"), "left")
          .groupBy("cell")
          .agg(count(lit(1)).as("n_new"),
            sum(coalesce(col("dup"), lit(0L))).as("n_dup"))
          .select(lit(batch).as("batch"), col("cell"), col("n_new"),
            col("n_dup"))
          .write.mode("append").parquet(outDir)
      }
      probe(f2, 2L)
      // ABSORB batch 2 under the frozen geometry: ONE transaction
      // appends corpus slice + index rows and publishes a single
      // record pinning both new versions — no rebuild, no re-read of
      // batch 1, and no observable state where the corpus moved but
      // the index didn't
      SnapTxn.commit(s, txroot,
        Seq("corpus" -> b2, "index" -> f2), note = "absorb")
      probe(f3, 3L)
      s.read.parquet(outDir).orderBy("batch", "cell")
    }
    if (sub <= 1L)
      // degenerate: the proven single-level plan
      pipeline(
        c1.withColumn("scell", lit(1L)).select(cols: _*),
        c2.withColumn("scell", lit(1L)).select(cols: _*),
        c3.withColumn("scell", lit(1L)).select(cols: _*))
    else {
      // two-level: c1 feeds BOTH the sub-centroid table and its own
      // fine assignment, and every probe batch routes against the SAME
      // batch-1 sub-centroids — persist + prime c1 once instead of
      // recomputing the coarse crossJoin+groupBy per consumer
      val c1p = c1.persist()
      try {
        c1p.count()
        val subCents = graft.vec.IvfRouting.subCentroids(c1p, sub)
        pipeline(
          graft.vec.IvfRouting.assignSub(c1p, subCents),
          graft.vec.IvfRouting.assignSub(c2, subCents),
          graft.vec.IvfRouting.assignSub(c3, subCents))
      } finally c1p.unpersist(blocking = false)
    }
  }

  /** Driver-side 1e-6 rounding, half AWAY FROM ZERO — the same convention
    * as Det.dround / DuckDB's round (math.round is floor(x+0.5), which
    * rounds negative halves toward +inf and would diverge from the oracle
    * on an exact half-boundary of the typically-negative betas). */
  private def dround6(d: Double): Double = {
    val x = d * 1e6
    (if (x < 0) -math.floor(-x + 0.5) else math.floor(x + 0.5)) / 1e6
  }
}
