package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 wave 54: two-level IVF routing for the ANN / semantic-dedup
  * family — the scale path past the broadcast-centroid cap.
  *
  * `vec_semdedup_2level` is `vec_semdedup` with the cell assignment split
  * into the two layers `VecAlgs.cellSplit` sizes:
  *
  *  - COARSE layer: `coarse` (<= cap) seed centroids (the lowest-id
  *    embeddings), BROADCAST — the only driver-bounded structure.
  *  - SUB layer: within each coarse cell, `sub` sub-centroids (that
  *    cell's lowest-id members), kept as a PARTITIONED table probed by a
  *    JOIN ON THE COARSE CELL ID — never a second broadcast. Its size is
  *    coarse·sub rows, which grows with n, exactly why it must stay
  *    distributed.
  *
  * Past n ≈ cap² (~4.3e9 rows at the default 65536 cap) the single-level
  * scheme's per-cell population grows linearly again; the second layer
  * restores total cells >= ⌈√n⌉ so the within-cell pairwise stage stays
  * n·√n work at every n. The op runs with cap=4 so BOTH layers are
  * genuinely exercised at fixture scale (500 vectors → coarse=4, sub=6);
  * the sizing law itself is pinned across the real cap boundary by
  * CellSplitSpec. Fully deterministic (seed centroids by id, integer-grid
  * geometry, ties to lowest id), so it is oracle-checked end-to-end —
  * DuckDB replays both routing layers and the dedup.
  */
object Wave54Ops extends QueryModule {

  /** The op's reduced broadcast cap (see scaladoc above). */
  val DemoCap = 4L

  def queries: Seq[Q] = Seq(
    Q(
      "vec_semdedup_2level",
      (s, dir) => {
        val gridded = T(s, dir, "embeddings")
          .select(col("vec_id"), expr(
            "transform(embedding, x -> " +
              "CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT))").as("g"))
        val (coarse, sub) =
          graft.vec.VecAlgs.cellSplit(T.rows(s, dir, "embeddings"),
            cap = DemoCap)
        // both routing layers via the SHARED machinery (IvfRouting) the
        // production ops now engage conditionally — this op pins it
        // against the DuckDB oracle with both layers live (cap=4)
        val cents = gridded.filter(col("vec_id") < coarse)
          .select(col("vec_id").as("cid"), col("g").as("cg"))
        val fine = graft.vec.IvfRouting.assignFine(gridded, cents, sub)
        // dedup within the FINE (cell, scell) cells: u < v, cosine on the
        // integer grid, rounded 1e-9 before the threshold compare
        val dropped = fine.as("u")
          .join(fine.as("v"), col("u.cell") === col("v.cell") &&
            col("u.scell") === col("v.scell") &&
            col("u.vec_id") < col("v.vec_id"))
          .withColumn("dot", expr(
            "aggregate(zip_with(u.g, v.g, (a, b) -> a * b), " +
              "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
          .withColumn("n2u", expr(
            "aggregate(u.g, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
          .withColumn("n2v", expr(
            "aggregate(v.g, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
          .withColumn("cos", round(col("dot") /
            sqrt(col("n2u").cast("double") * col("n2v").cast("double"))
            * 1e9) / 1e9)
          .filter(col("cos") > 0.3)
          .select(col("v.cell").as("cell"), col("v.scell").as("scell"),
            col("v.vec_id").as("vec_id"))
          .distinct()
        fine.join(dropped.withColumn("drop", lit(1L)),
            Seq("cell", "scell", "vec_id"), "left")
          .groupBy("cell", "scell")
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(coalesce(col("drop"), lit(0L))).as("n_dropped"))
          .orderBy("cell", "scell")
      },
      Some(
        "WITH g AS (SELECT vec_id, list_transform(embedding, " +
          "x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS g " +
          "FROM embeddings), " +
          "p AS (SELECT GREATEST(1, CAST(ceil(sqrt(CAST((SELECT count(*) " +
          "FROM g) AS DOUBLE))) AS BIGINT)) AS want), " +
          "pp AS (SELECT LEAST(4, want) AS coarse, GREATEST(1, " +
          "CAST(ceil(CAST(want AS DOUBLE) / LEAST(4, want)) AS BIGINT)) " +
          "AS sub FROM p), " +
          "c AS (SELECT vec_id AS cid, g AS cg FROM g " +
          "WHERE vec_id < (SELECT coarse FROM pp)), " +
          "cells AS (SELECT vec_id, g, (SELECT cid FROM c ORDER BY " +
          "list_sum(list_transform(list_zip(g.g, c.cg), " +
          "p -> (p[1] - p[2]) * (p[1] - p[2]))), cid LIMIT 1) AS cell " +
          "FROM g), " +
          "sc AS (SELECT cell, scid, sg FROM (SELECT cell, " +
          "CAST(row_number() OVER (PARTITION BY cell ORDER BY vec_id) " +
          "AS BIGINT) AS scid, g AS sg FROM cells) " +
          "WHERE scid <= (SELECT sub FROM pp)), " +
          "fine AS (SELECT cells.vec_id, cells.cell, cells.g, " +
          "(SELECT scid FROM sc WHERE sc.cell = cells.cell ORDER BY " +
          "list_sum(list_transform(list_zip(cells.g, sc.sg), " +
          "p -> (p[1] - p[2]) * (p[1] - p[2]))), scid LIMIT 1) AS scell " +
          "FROM cells), " +
          "pairs AS (SELECT v.cell AS cell, v.scell AS scell, " +
          "v.vec_id AS vec_id, round(list_sum(list_transform(" +
          "list_zip(u.g, v.g), p -> p[1] * p[2])) / sqrt(" +
          "CAST(list_sum(list_transform(u.g, x -> x * x)) AS DOUBLE) * " +
          "CAST(list_sum(list_transform(v.g, x -> x * x)) AS DOUBLE)) " +
          "* 1e9) / 1e9 AS cos " +
          "FROM fine u JOIN fine v ON u.cell = v.cell " +
          "AND u.scell = v.scell AND u.vec_id < v.vec_id), " +
          "dropped AS (SELECT DISTINCT cell, scell, vec_id FROM pairs " +
          "WHERE cos > 0.3) " +
          "SELECT fine.cell, fine.scell, " +
          "CAST(count(*) AS BIGINT) AS n_vecs, " +
          "CAST(sum(CASE WHEN dropped.vec_id IS NOT NULL THEN 1 ELSE 0 " +
          "END) AS BIGINT) AS n_dropped " +
          "FROM fine LEFT JOIN dropped ON fine.cell = dropped.cell " +
          "AND fine.scell = dropped.scell " +
          "AND fine.vec_id = dropped.vec_id " +
          "GROUP BY fine.cell, fine.scell ORDER BY fine.cell, fine.scell")
    ),
    Q(
      "vec_knn_probe_2level",
      // Two-level IVF SERVING path (the probe-side twin of
      // vec_semdedup_2level): BUILD assigns every vector to a
      // (coarse cell, sub cell) — coarse by broadcast centroids, sub by
      // a per-cell centroid table probed by JOIN on the coarse id, never
      // a second broadcast — and materializes the index as parquet
      // PARTITIONED BY the coarse cell. PROBE ranks the <= cap coarse
      // centroids on the driver (bounded by the cap, the whole point),
      // prunes the index read to the probed partitions, ranks sub-cells
      // with a distributed join, and exact-reranks only the matching
      // fine cells. Integer-grid geometry end-to-end, ties to lowest id
      // — fully deterministic, so DuckDB replays build + both routing
      // layers + rerank.
      (s, dir) => {
        import s.implicits._
        val gridded = T(s, dir, "embeddings")
          .select(col("vec_id"), expr(
            "transform(embedding, x -> " +
              "CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT))").as("g"))
        val (coarse, sub) =
          graft.vec.VecAlgs.cellSplit(T.rows(s, dir, "embeddings"),
            cap = DemoCap)
        val d2 = (a: String, b: String) => expr(
          s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)")
        val n2 = (a: String) => expr(
          s"aggregate($a, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")
        val cents = gridded.filter(col("vec_id") < coarse)
          .select(col("vec_id").as("cid"), col("g").as("cg"))
        // both routing layers via the SHARED IvfRouting machinery (the
        // same plans the production ops engage conditionally); the
        // coarse assignment feeds the index BUILD and the probe's
        // sub-centroid derivation — persist + prime it once so the
        // O(n·coarse) stage never recomputes across the two jobs
        val assigned = graft.vec.IvfRouting.assignCoarse(gridded, cents)
          .persist()
        assigned.count()
        val subCents = graft.vec.IvfRouting.subCentroids(assigned, sub)
        // BUILD: fine assignment -> parquet partitioned by coarse cell
        // (zero-norm vectors excluded: cosine is undefined on them)
        val idxDir = graft.Tmp.dir("graft_ivf2_idx")
        graft.vec.IvfRouting.assignSub(assigned, subCents)
          .select(col("vec_id"), col("cell"), col("scell"), col("g"),
            n2("g").as("nn"))
          .filter(col("nn") > 0)
          .write.mode("overwrite").partitionBy("cell").parquet(idxDir)
        // PROBE: coarse ranking on the DRIVER over <= cap centroids
        // (exact integer L2, ties to lowest cid — same order as the
        // oracle's rank), nprobe = 2
        val qids = Seq(5L, 17L, 42L)
        val centArr = cents.collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
        def il2(a: Array[Long], b: Array[Long]): BigInt = {
          var sum = BigInt(0)
          var i = 0
          while (i < a.length) {
            val dd = BigInt(a(i) - b(i)); sum += dd * dd; i += 1
          }
          sum
        }
        val probes = gridded.filter(col("vec_id").isin(qids: _*))
          .select(col("vec_id"), col("g")).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
          .filter { case (_, g) => g.exists(_ != 0L) }
          .flatMap { case (qid, qg) =>
            centArr.map { case (cid, cg) => (il2(qg, cg), cid) }
              .sortBy(identity).take(2)
              .map { case (_, cid) => (qid, cid, qg.toSeq) }
          }.toSeq
        val probeDf = broadcast(probes.toDF("q_id", "cell", "qg"))
        val probedCells = probes.map(_._2).distinct.sorted
        // sub-cell ranking stays DISTRIBUTED: the sub-centroid table is
        // joined on the coarse cell id (grows with n — must not sit on
        // the driver), nsub = 2 per probed coarse cell
        val ws = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id", "cell").orderBy(col("sd2"), col("scid"))
        val subPicks = probeDf
          .join(subCents.filter(col("cell").isin(probedCells: _*)), "cell")
          .withColumn("sd2", d2("qg", "sg"))
          .withColumn("srk", row_number().over(ws))
          .filter(col("srk") <= 2)
          .select(col("q_id"), col("cell"), col("scid"), col("qg"))
        // exact cosine rerank inside the probed fine cells only; the
        // index scan prunes to the probed coarse partitions
        val idx = s.read.parquet(idxDir)
          .filter(col("cell").isin(probedCells: _*))
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
        val outDir = graft.Tmp.dir("graft_ivf2_probe_out")
        val probe = idx.join(subPicks,
            idx("cell") === subPicks("cell") &&
              idx("scell") === subPicks("scid"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("dot", expr(
            "aggregate(zip_with(g, qg, (a, b) -> a * b), " +
              "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
          .withColumn("qn2", n2("qg"))
          .withColumn("sim", round(col("dot") /
            sqrt(col("nn").cast("double") * col("qn2").cast("double"))
            * 1e9) / 1e9)
          .withColumn("rnk", row_number().over(wr).cast("long"))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("vec_id"), col("sim"), col("rnk"))
        // plan-shape assertion IN-OP (the op is eager now, so the
        // returned frame's plan is just the scratch read — the pruning
        // property is enforced where the probe plan exists, the
        // sink_nested_prune pattern)
        // the filter LIST must be non-empty and name the partition
        // column: FileSourceScanExec always prints 'PartitionFilters'
        // (even as '[]') and 'cell' appears as a plain column name in any
        // probe plan, so a bare contains() check is vacuous —
        // [^\]]* keeps the match inside ONE bracket list
        val plan = probe.queryExecution.executedPlan.toString
        require("""PartitionFilters: \[[^\]]*cell""".r
            .findFirstIn(plan).isDefined,
          s"no coarse-cell partition pruning in the probe plan:\n$plan")
        probe.write.mode("overwrite").parquet(outDir)
        assigned.unpersist(blocking = false)
        s.read.parquet(outDir).orderBy("q_id", "rnk")
      },
      Some(
        "WITH g AS (SELECT vec_id, list_transform(embedding, " +
          "x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS g " +
          "FROM embeddings), " +
          "p AS (SELECT GREATEST(1, CAST(ceil(sqrt(CAST((SELECT count(*) " +
          "FROM g) AS DOUBLE))) AS BIGINT)) AS want), " +
          "pp AS (SELECT LEAST(4, want) AS coarse, GREATEST(1, " +
          "CAST(ceil(CAST(want AS DOUBLE) / LEAST(4, want)) AS BIGINT)) " +
          "AS sub FROM p), " +
          "c AS (SELECT vec_id AS cid, g AS cg FROM g " +
          "WHERE vec_id < (SELECT coarse FROM pp)), " +
          "cells AS (SELECT vec_id, g, (SELECT cid FROM c ORDER BY " +
          "list_sum(list_transform(list_zip(g.g, c.cg), " +
          "p -> (p[1] - p[2]) * (p[1] - p[2]))), cid LIMIT 1) AS cell " +
          "FROM g), " +
          "sc AS (SELECT cell, scid, sg FROM (SELECT cell, " +
          "CAST(row_number() OVER (PARTITION BY cell ORDER BY vec_id) " +
          "AS BIGINT) AS scid, g AS sg FROM cells) " +
          "WHERE scid <= (SELECT sub FROM pp)), " +
          "fine AS (SELECT cells.vec_id, cells.cell, cells.g, " +
          "list_sum(list_transform(cells.g, x -> x * x)) AS nn, " +
          "(SELECT scid FROM sc WHERE sc.cell = cells.cell ORDER BY " +
          "list_sum(list_transform(list_zip(cells.g, sc.sg), " +
          "p -> (p[1] - p[2]) * (p[1] - p[2]))), scid LIMIT 1) AS scell " +
          "FROM cells), " +
          "q AS (SELECT vec_id AS q_id, g AS qg, " +
          "list_sum(list_transform(g, x -> x * x)) AS qn2 FROM g " +
          "WHERE vec_id IN (5, 17, 42) " +
          "AND list_sum(list_transform(g, x -> abs(x))) > 0), " +
          "pc AS (SELECT q_id, cell FROM (SELECT q.q_id, c.cid AS cell, " +
          "row_number() OVER (PARTITION BY q.q_id ORDER BY " +
          "list_sum(list_transform(list_zip(q.qg, c.cg), " +
          "p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rk " +
          "FROM q, c) WHERE rk <= 2), " +
          "ps AS (SELECT q_id, cell, scid FROM (SELECT pc.q_id, " +
          "pc.cell, sc.scid, row_number() OVER (PARTITION BY pc.q_id, " +
          "pc.cell ORDER BY list_sum(list_transform(" +
          "list_zip(q.qg, sc.sg), " +
          "p -> (p[1] - p[2]) * (p[1] - p[2]))), sc.scid) AS rk " +
          "FROM pc JOIN sc ON sc.cell = pc.cell " +
          "JOIN q ON q.q_id = pc.q_id) WHERE rk <= 2), " +
          "cand AS (SELECT ps.q_id, f.vec_id, " +
          "round(list_sum(list_transform(list_zip(f.g, q.qg), " +
          "p -> p[1] * p[2])) / sqrt(CAST(f.nn AS DOUBLE) * " +
          "CAST(q.qn2 AS DOUBLE)) * 1e9) / 1e9 AS sim " +
          "FROM ps JOIN fine f ON f.cell = ps.cell " +
          "AND f.scell = ps.scid AND f.nn > 0 " +
          "JOIN q ON q.q_id = ps.q_id WHERE f.vec_id <> ps.q_id) " +
          "SELECT q_id, vec_id, sim, rnk FROM (SELECT q_id, vec_id, " +
          "sim, CAST(row_number() OVER (PARTITION BY q_id ORDER BY " +
          "sim DESC, vec_id) AS BIGINT) AS rnk FROM cand) " +
          "WHERE rnk <= 5 ORDER BY q_id, rnk")
    ),
    Q(
      "data_incremental_neardup",
      // Snapshot-incremental NEAR-dup (see IncNeardup): batch 1 commits
      // the corpus half and builds the banded-MinHash bucket + tokset
      // index ONCE; batch 2 featurizes ONLY its own rows, probes the
      // bucket table for candidates, exact-verifies by Jaccard
      // (lixsize), and absorbs corpus + index in ONE transaction —
      // per-commit cost O(batch + matching buckets), never a corpus
      // re-scan. The index is ACID (VERDICT-r11 #1): corpus, buckets
      // and toksets are SnapTables pinned together by a SnapTxn record,
      // so the index version IS the corpus version (one pin set per
      // absorb) and a crash anywhere mid-absorb leaves only invisible
      // orphans — readers stay on the prior consistent pin set; a torn
      // index (buckets appended, toksets not) is impossible by
      // construction. No oracle (seeded MinHash banding prunes
      // candidates, per the SURVEY §2.10 declaration); IncNeardupSpec
      // pins detection + absorb arithmetic + the torn-absorb and
      // version-pin properties.
      (s, dir) => {
        import graft.sources.{SnapTable, SnapTxn}
        val txroot = graft.Tmp.dir("graft_incneardup_tx")
        val docs = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"))
        // batch 1: create corpus + both index tables from the committed
        // snapshot, then pin all three at v1 in tx v1
        SnapTable.create(s, s"$txroot/corpus",
          docs.filter(col("doc_id") % 2 === 0), "doc_id")
        // r15 (VERDICT-r14 #4): featurize the index half ONCE — the r14
        // shape fed the unpersisted featurize plan (tokenize + 64-hash
        // MinHash per doc, the op's heaviest per-row work) into TWO
        // separate table-create writes, re-running it end to end for
        // the second. Persist + one dedicated cache-populating job
        // (the fd discipline below), then both creates scan the cache.
        // r15 note: repartitioning the featurize INPUT to session width
        // was tried and REVERTED — the text-payload shuffle it adds
        // cost more than the map-side spread bought (13.2 s vs 9.3 s
        // measured); the explosion spread lives where it belongs, on
        // the byte-light bucket rows inside IncNeardup.candidates.
        val f1 = IncNeardup.featurize(
          SnapTable.readVersion(s, s"$txroot/corpus", 1)).persist()
        try {
          f1.count()
          SnapTable.create(s, s"$txroot/buckets",
            IncNeardup.bucketRows(f1), "doc_id")
          SnapTable.create(s, s"$txroot/toksets",
            f1.select(col("doc_id"), col("tokset")), "doc_id")
        } finally f1.unpersist(blocking = false)
        SnapTxn.init(txroot, Seq("corpus", "buckets", "toksets"))
        // batch 2: featurize the INCOMING delta (the frame being
        // committed — verify-then-commit, the real ingest shape), probe
        // the tx-pinned index, then absorb atomically
        val delta = docs.filter(col("doc_id") % 2 === 1)
        val fd = IncNeardup.featurize(delta).persist()
        try {
          // populate the cache with ONE dedicated job before the verify
          // plan consumes fd on two branches (candidates + tokset join):
          // branches of a single job race the cache and would re-featurize
          fd.count()
          val hits = IncNeardup.verify(
            IncNeardup.candidates(fd, SnapTxn.read(s, txroot, "buckets")),
            fd, SnapTxn.read(s, txroot, "toksets"))
          val flagged = hits.groupBy(col("new_id").as("doc_id"))
            .agg(count(lit(1)).as("n_matches"))
          val agg = fd.select(col("doc_id"), col("lang"))
            .join(flagged, Seq("doc_id"), "left")
            .groupBy("lang")
            .agg(
              count(lit(1)).as("n_new"),
              sum(when(col("n_matches").isNotNull, 1L).otherwise(0L))
                .as("n_neardup"),
              sum(coalesce(col("n_matches"), lit(0L))).as("n_pairs"))
            .orderBy("lang")
          // pin the aggregate BEFORE absorbing — the bench's timed path
          // must pay the real candidates+verify cost (the lazy-return
          // floor artifact round 11 documented). The result is a few
          // per-lang rows, so a driver collect is the cheap pin.
          val rows = agg.collect()
          // absorb: ONE tx commit appends corpus + buckets + toksets and
          // publishes a single record pinning all three new versions —
          // the next commit probes an index that exactly reflects the
          // corpus it is pinned with
          SnapTxn.commit(s, txroot, Seq(
            "corpus" -> delta,
            "buckets" -> IncNeardup.bucketRows(fd),
            "toksets" -> fd.select(col("doc_id"), col("tokset"))),
            note = "absorb")
          s.createDataFrame(
            java.util.Arrays.asList(rows: _*), agg.schema)
        } finally fd.unpersist(blocking = false)
      },
      None
    )
  )
}
