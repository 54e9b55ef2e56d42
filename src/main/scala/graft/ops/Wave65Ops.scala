package graft.ops

import graft.{Q, QueryModule, T, Tmp}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Round-14 wave 65: the curation funnel as a LIVE cadence
  * (VERDICT-r13 task #1 / SURVEY §17.2 #1) — documents LAND as
  * SnapTable commits and every funnel decision is made per micro-batch
  * under ONE SnapTxn commit, such that after all waves absorb, the
  * collapsed per-doc decision changelog EQUALS the batch
  * `pipe_curation_ledger` exactly (the shared ledgerOracleSql replays
  * it — the equality that PROVES the incremental maintenance rather
  * than asserting it).
  *
  * Why decisions must be a CHANGELOG, not a write-once log: later
  * arrivals legitimately change earlier verdicts —
  *  - a new doc can bridge two stage-4 near-dup components, so a doc
  *    that was its component's min (a survivor) is merged under a
  *    smaller min and flips to `near_dup`;
  *  - that flip REMOVES the doc from the stage-5 semdedup graph, so a
  *    doc that had been semdedup'd INTO it can flip back to
  *    `survived` (its component re-splits around the removal).
  * The ledger is therefore an append-only (wave, doc_id, decision)
  * changelog under SnapTxn; serving collapses to the latest wave per
  * doc. Exactly the maintenance discipline `dedup_crossmodal_incr`
  * proved for one CC table, extended to the full five-stage funnel
  * with DELETIONS at stage 5.
  *
  * ARRIVAL CONTRACT (enforced per batch, loudly): doc_ids arrive in
  * strictly ascending order — the production shape where ingest
  * assigns monotone ids, so arrival order IS id order. This is what
  * makes the incremental state MONOTONE where it must be: the
  * stage-3 keeper (min doc_id per fingerprint) is always the FIRST
  * arrival, so keepers are never demoted and the stage-4 node set
  * only grows; stage-4 labels only decrease (merges), so stage-4
  * survivorship only flips one way (survivor → near_dup) and the
  * stage-5 graph sees additions plus those removals — never
  * re-entries. Out-of-order ids would need keeper demotion (a
  * cascading re-run of stages 3-5 for the demoted doc's cohort) —
  * refused, not silently mis-decided.
  *
  * Per-batch cost (the 100-TB argument):
  *  - gates are row-local (O(batch));
  *  - stage 3 probes the fingerprint index on fp (O(batch + hits));
  *  - stage 4 probes the PREFIX index with the complete
  *    PPJoin/AllPairs candidate rule (prefix-collision-bounded, the
  *    measured e≈0.71 path) and runs CC over the STAR-COMPRESSED
  *    reduced graph — new edges plus one id→comp link per labeled
  *    doc, the dedup_crossmodal_incr discipline (per-absorb rounds
  *    track the NEW edges' diameter, never the corpus's);
  *  - stage 5 is delta-CC WITH DELETIONS: only components touched by
  *    a new edge or a removed member are recomputed, from their
  *    cell-bounded edges re-derived inside the affected (cell, scell)
  *    buckets — untouched components keep their labels. Closure
  *    argument: an edge never crosses two components, so every node
  *    whose label can change lies in an affected component.
  *  - the label/ledger collapses read O(corpus-so-far) rows per
  *    batch — same accepted cost as dedup_crossmodal_incr's pinned
  *    label read; at 100 TB these live as SnapTables keyed by doc
  *    (merge-on-read) and the collapse is the standard changelog
  *    compaction the maintenance cadence (`table_txn_compact`)
  *    already owns.
  * All seven state tables commit in ONE SnapTxn per micro-batch with
  * the batch id in the note — idempotent replay, restart durability,
  * and a crash mid-absorb leaves only unpinned orphans (readers stay
  * on the prior consistent decision set). Wave65Spec forces the
  * decision-flip paths on a purpose-built fixture and pins
  * replay/restart; the graded op runs the landing-table transport
  * (SnapTable commits → `snapstream` feed) at fixture scale.
  *
  * The stage-4 candidate rule here is the COMPLETE deterministic
  * prefix filter (required for oracle equality; Guard.quadratic-fenced
  * like every exactness twin). The unfenced production swap is
  * IncNeardup's banded MinHash probe behind the same verify — the
  * measured e=0.26 path — at the price of the completeness guarantee
  * the oracle needs.
  */
object Wave65Ops extends QueryModule {

  /** The transactional live-funnel cadence, factored out of the
    * streaming sink so specs (and a restarted query) drive it
    * directly. State tables (one txroot, pinned together):
    *  - ledger(wave, doc_id, dropped_at, reason, kept_by, n_toks) —
    *    the decision changelog (the graded artifact);
    *  - fps(fp, keeper) — stage-3 fingerprint index;
    *  - pref(doc_id, len, lang, source, ptok) + ts4(doc_id, ts) —
    *    stage-4 prefix index + token sets of s3 survivors;
    *  - labels4(wave, id, comp) — stage-4 CC label changelog over ALL
    *    s3 survivors;
    *  - labels5(wave, id, comp) — stage-5 CC label changelog over
    *    ever-members (rows of removed members go stale and are
    *    masked by the membership semi-join at read);
    *  - vecidx(vec_id, cell, scell, g) — routed vectors of every doc
    *    that ever entered the stage-5 graph (append-only; membership
    *    is labels4-derived at read).
    */
  object LiveFunnel {
    import graft.sources.{SnapTable, SnapTxn}

    val Tables: Seq[String] =
      Seq("ledger", "fps", "pref", "ts4", "labels4", "labels5",
        "vecidx")

    private val Block = Seq("lang", "source")

    private def latestBy(df: DataFrame, key: String): DataFrame = {
      val w = Window.partitionBy(key).orderBy(col("wave").desc)
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }

    /** DDL-first setup from a ZERO-ROW landing frame
      * `(doc_id, lang, source, text, n_chars, g)` — plan-only, no
      * jobs. `g` is the grid-quantized vector (null = no vector). */
    def setup(s: SparkSession, txroot: String, landing0: DataFrame,
        route: DataFrame => DataFrame): Unit = {
      val led = StructType(Seq(
        StructField("wave", LongType, nullable = false),
        StructField("doc_id", LongType),
        StructField("dropped_at", LongType),
        StructField("reason", StringType),
        StructField("kept_by", LongType),
        StructField("n_toks", LongType)))
      SnapTable.createEmpty(s"$txroot/ledger", led, "doc_id")
      SnapTable.createEmpty(s"$txroot/fps", StructType(Seq(
        StructField("fp", StringType),
        StructField("keeper", LongType))), "keeper")
      val t40 = landing0.select(col("doc_id"), col("lang"),
        col("source"),
        array_sort(array_distinct(split(col("text"), " "))).as("ts"))
      SnapTable.createEmpty(s"$txroot/pref",
        Wave64Ops.prefixRows(t40, Block).schema, "doc_id")
      SnapTable.createEmpty(s"$txroot/ts4",
        t40.select("doc_id", "ts").schema, "doc_id")
      val lbl = StructType(Seq(
        StructField("wave", LongType, nullable = false),
        StructField("id", LongType),
        StructField("comp", LongType)))
      SnapTable.createEmpty(s"$txroot/labels4", lbl, "id")
      SnapTable.createEmpty(s"$txroot/labels5", lbl, "id")
      SnapTable.createEmpty(s"$txroot/vecidx",
        route(landing0.filter(col("g").isNotNull)
          .select(col("doc_id").as("vec_id"), col("g"))).schema,
        "vec_id", spec = Seq("cell"))
      SnapTxn.init(txroot, Tables)
    }

    /** One micro-batch: gates → fingerprint probe → prefix-index probe
      * + star-compressed CC → affected-component delta-CC → decision
      * diff — all seven tables absorbed in ONE transaction. Idempotent
      * (a replayed batch id is a no-op, -1). Returns ledger delta
      * rows. */
    def ingest(s: SparkSession, txroot: String, batch: DataFrame,
        batchId: Long, route: DataFrame => DataFrame): Long = {
      if (SnapTxn.batchAbsorbed(txroot, batchId)) return -1L
      val w = lit(batchId).as("wave")
      val nullL = lit(null).cast("long")
      val cache = scala.collection.mutable.ArrayBuffer[DataFrame]()
      def p(df: DataFrame): DataFrame = { cache += df.persist(); df }
      val partsKey = "spark.sql.shuffle.partitions"
      val prevParts = s.conf.get(partsKey)
      try {
        // consumed three times per wave (arrival guard, old-candidate
        // n_toks, decision diff) — one O(ledger) window collapse, not
        // three
        val prevLedger = p(latestBy(SnapTxn.read(s, txroot, "ledger"),
          "doc_id"))
        val b0 = p(batch
          .select(col("doc_id"), col("lang"), col("source"),
            col("text"), col("n_chars"), col("g"))
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_toks", size(col("toks")).cast("long")))
        // ARRIVAL CONTRACT: strictly ascending ids (see object doc)
        val minNew = b0.agg(coalesce(min("doc_id"),
          lit(Long.MaxValue))).first().getLong(0)
        val maxOld = prevLedger.agg(coalesce(max("doc_id"),
          lit(Long.MinValue))).first().getLong(0)
        require(minNew > maxOld,
          s"pipe_curation_live: batch $batchId min doc_id $minNew " +
            s"is not above the absorbed max $maxOld — ids must " +
            "arrive in ascending order (ingest-assigned); an " +
            "out-of-order id would demote an already-published " +
            "stage-3 keeper")
        // shuffle width follows the DATA (the ccMinLabel/Wave55
        // discipline): an ingest wave runs ~30 small exchanges over
        // state + batch frames, and core-count width just multiplies
        // task-scheduling overhead at fixture scale while the corpus-
        // sized collapses size it up at 100 TB (~250k rows/partition,
        // floor 4). Both counts are cached-frame scans. ccMinLabel
        // scopes its own width inside this one and restores ours.
        s.conf.set(partsKey, math.max(4L,
          (prevLedger.count() + b0.count()) / 250000L).toString)
        // stages 1-2: row-local gates
        val s1B = b0.filter(TextOps.langIdExpr(col("text")) ===
          col("lang"))
        val s2B = s1B.filter(Wave64Ops.qualityScore >= 0.5)
        // stage 3: fingerprint-index probe; keeper = first arrival
        val fpB = s2B.withColumn("fp", md5(concat_ws(" ",
          array_sort(array_distinct(col("toks"))))))
        val fpJ = p(fpB.join(
          SnapTxn.read(s, txroot, "fps")
            .withColumnRenamed("keeper", "old_keeper"),
          Seq("fp"), "left"))
        val newFp = fpJ.filter(col("old_keeper").isNull)
        val keeperB = p(newFp.groupBy("fp")
          .agg(min("doc_id").as("keeper")))
        val s3B = p(newFp.join(keeperB, Seq("fp"))
          .filter(col("doc_id") === col("keeper")))
        // stage 4: complete prefix-candidate probe (index + in-batch)
        val t4B = p(s3B.select(col("doc_id"), col("lang"),
          col("source"),
          array_sort(array_distinct(col("toks"))).as("ts")))
        val prefB = p(Wave64Ops.prefixRows(t4B, Block))
        // hot-group fence over index ∪ batch — the probe join's
        // per-group cost is g_batch · g_index, so the UNION group
        // size is the bound that matters (Wave64Ops.PrefixGroupCap)
        Wave64Ops.fencePrefixGroups(
          SnapTxn.read(s, txroot, "pref").unionByName(prefB), Block,
          s"pipe_curation_live:near:b$batchId")
        val cond = Wave64Ops.prefixCondXY(Block)
        val candNewOld = prefB.as("x")
          .join(SnapTxn.read(s, txroot, "pref").as("y"), cond)
          .select(col("y.doc_id").as("a"), col("x.doc_id").as("b"))
        val candNewNew = prefB.as("x")
          .join(prefB.as("y"),
            cond && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        val newEdges4 = Wave64Ops.jaccardVerify(
          candNewOld.union(candNewNew).distinct(),
          SnapTxn.read(s, txroot, "ts4")
            .unionByName(t4B.select("doc_id", "ts")))
        // star-compressed incremental CC (dedup_crossmodal_incr)
        val prevL4 = p(latestBy(SnapTxn.read(s, txroot, "labels4"),
          "id").select("id", "comp"))
        val links4 = prevL4.filter(col("id") =!= col("comp"))
          .select(col("id").as("a"), col("comp").as("b"))
        val newL4 = p(Wave64Ops.ccMinLabel(s,
          prevL4.select("id")
            .union(s3B.select(col("doc_id").as("id"))),
          newEdges4.union(links4),
          s"pipe_curation_live:near:b$batchId"))
        val l4Delta = p(newL4
          .join(prevL4.withColumnRenamed("comp", "pcomp"), Seq("id"),
            "left")
          .filter(col("pcomp").isNull || col("pcomp") =!= col("comp"))
          .select(w, col("id"), col("comp")))
        // stage 5: delta-CC with deletions over affected components
        val s4Now = p(newL4.filter(col("id") === col("comp"))
          .select("id"))
        val s4Prev = prevL4.filter(col("id") === col("comp"))
          .select("id")
        val removed = p(s4Prev.join(s4Now, Seq("id"), "left_anti"))
        val addedIds = s4Now.join(s4Prev, Seq("id"), "left_anti")
        val addedRouted = p(route(
          b0.filter(col("g").isNotNull)
            .select(col("doc_id").as("vec_id"), col("g"))
            .join(addedIds.withColumnRenamed("id", "vec_id"),
              Seq("vec_id"), "left_semi")))
        val vecAll = p(SnapTxn.read(s, txroot, "vecidx")
          .unionByName(addedRouted))
        val memRouted = p(vecAll.join(
          s4Now.withColumnRenamed("id", "vec_id"), Seq("vec_id"),
          "left_semi"))
        val prevM5 = p(latestBy(SnapTxn.read(s, txroot, "labels5"),
          "id").select("id", "comp")
          .join(s4Prev, Seq("id"), "left_semi")
          .join(vecAll.select(col("vec_id").as("id")), Seq("id"),
            "left_semi"))
        val newEdges5 = p(Wave62Ops.VecStreamIndex
          .probeHits(addedRouted, memRouted)
          .filter(col("vec_a") =!= col("vec_b"))
          .select(col("vec_a").as("a"), col("vec_b").as("b"))
          .distinct())
        val affected = newEdges5.select(col("a").as("id"))
          .union(newEdges5.select(col("b").as("id")))
          .union(removed)
          .join(prevM5, Seq("id"))
          .select("comp").distinct()
        val subOld = prevM5
          .join(affected, Seq("comp"), "left_semi")
          .join(removed, Seq("id"), "left_anti")
          .select("id")
        val subNodes = p(subOld
          .union(addedRouted.select(col("vec_id").as("id"))))
        val subRouted = p(vecAll.join(
          subNodes.withColumnRenamed("id", "vec_id"), Seq("vec_id"),
          "left_semi"))
        val newSubL5 = p(Wave64Ops.ccMinLabel(s, subNodes,
          Wave64Ops.semPairs(subRouted),
          s"pipe_curation_live:sem:b$batchId"))
        val l5Delta = p(newSubL5
          .join(prevM5.withColumnRenamed("comp", "pcomp"), Seq("id"),
            "left")
          .filter(col("pcomp").isNull || col("pcomp") =!= col("comp"))
          .select(w, col("id"), col("comp")))
        val comp5Now = prevM5
          .join(subNodes, Seq("id"), "left_anti")
          .join(removed, Seq("id"), "left_anti")
          .union(newSubL5)
        // decisions for every s3 survivor whose verdict can have moved
        val oldCand = l4Delta.select("id")
          .union(subOld)
          .join(b0.select(col("doc_id").as("id")), Seq("id"),
            "left_anti")
          .distinct()
          .join(prevLedger.withColumnRenamed("doc_id", "id")
            .select("id", "n_toks"), Seq("id"))
          .withColumn("is_new", lit(false))
        val targets = s3B
          .select(col("doc_id").as("id"), col("n_toks"))
          .withColumn("is_new", lit(true))
          .unionByName(oldCand)
        val dec = targets
          .join(newL4.withColumnRenamed("comp", "c4"), Seq("id"))
          .join(comp5Now.withColumnRenamed("comp", "c5"), Seq("id"),
            "left")
          .select(col("id").as("doc_id"), col("n_toks"),
            col("is_new"),
            when(col("c4") =!= col("id"), lit(4L))
              .when(col("c5").isNotNull && col("c5") =!= col("id"),
                lit(5L))
              .otherwise(lit(0L)).as("dropped_at"),
            when(col("c4") =!= col("id"), col("c4"))
              .when(col("c5").isNotNull && col("c5") =!= col("id"),
                col("c5"))
              .otherwise(nullL).as("kept_by"))
          .withColumn("reason",
            when(col("dropped_at") === 4L, "near_dup")
              .when(col("dropped_at") === 5L, "sem_dup")
              .otherwise("survived"))
        val decP = p(dec)
        def ledgerRow(df: DataFrame, stage: Long, why: String,
            keptBy: org.apache.spark.sql.Column): DataFrame =
          df.select(w, col("doc_id"), lit(stage).as("dropped_at"),
            lit(why).as("reason"), keptBy.as("kept_by"),
            col("n_toks"))
        val ledgerDelta =
          ledgerRow(b0.filter(!(TextOps.langIdExpr(col("text")) ===
            col("lang"))), 1L, "lang_mismatch", nullL)
          .unionByName(ledgerRow(
            s1B.filter(!(Wave64Ops.qualityScore >= 0.5)), 2L,
            "low_quality", nullL))
          .unionByName(ledgerRow(
            fpJ.filter(col("old_keeper").isNotNull), 3L, "exact_dup",
            col("old_keeper")))
          .unionByName(ledgerRow(
            newFp.join(keeperB, Seq("fp"))
              .filter(col("doc_id") =!= col("keeper")), 3L,
            "exact_dup", col("keeper")))
          .unionByName(decP.filter(col("is_new"))
            .select(w, col("doc_id"), col("dropped_at"),
              col("reason"), col("kept_by"), col("n_toks")))
          .unionByName(decP.filter(!col("is_new"))
            .join(prevLedger.select(col("doc_id"),
              col("dropped_at").as("pd"), col("kept_by").as("pk")),
              Seq("doc_id"))
            .filter(!(col("dropped_at") <=> col("pd")) ||
              !(col("kept_by") <=> col("pk")))
            .select(w, col("doc_id"), col("dropped_at"),
              col("reason"), col("kept_by"), col("n_toks")))
        val ledgerP = p(ledgerDelta)
        val n = ledgerP.count()
        SnapTxn.commit(s, txroot, Seq(
          "ledger" -> ledgerP,
          "fps" -> keeperB,
          "pref" -> prefB.toDF(),
          "ts4" -> t4B.select("doc_id", "ts"),
          "labels4" -> l4Delta,
          "labels5" -> l5Delta,
          "vecidx" -> addedRouted.toDF()),
          note = SnapTxn.batchNote(batchId))
        n
      } finally {
        s.conf.set(partsKey, prevParts)
        cache.foreach(_.unpersist(blocking = false))
      }
    }

    /** The decision set as of the current pin: the changelog collapsed
      * to its latest row per doc. */
    def serve(s: SparkSession, txroot: String): DataFrame =
      latestBy(SnapTxn.read(s, txroot, "ledger"), "doc_id")
        .select("doc_id", "dropped_at", "reason", "kept_by")
  }

  def queries: Seq[Q] = Seq(
    Q(
      "pipe_curation_live",
      (s, dir) => {
        import graft.sources.SnapTable
        // same exactness fence as the batch funnel: the complete
        // stage-4 candidate rule is collision-bounded, not
        // bucket-bounded (the banded-MinHash production swap is the
        // unfenced path)
        graft.Guard.quadratic(T(s, dir, "documents"),
          "pipe_curation_live stage-4 exact near-dedup")
        val docs = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"),
            col("text"), col("n_chars"))
        val (route, gridded, _) = Wave62Ops.semdedupGeometry(s, dir)
        // docs and their (grid-quantized) vectors LAND TOGETHER —
        // the landing table is the production contract; zero-norm
        // vectors are already excluded from `gridded` (no cosine)
        val landingDf = docs.join(
          gridded.withColumnRenamed("vec_id", "doc_id"),
          Seq("doc_id"), "left")
        val landing = Tmp.dir("graft_livefunnel_landing")
        val txroot = Tmp.dir("graft_livefunnel_tx")
        val ckpt = Tmp.dir("graft_livefunnel_ckpt")
        LiveFunnel.setup(s, txroot, landingDf.limit(0), route)
        def drain(): Unit = {
          val q = s.readStream.format("snapstream").load(landing)
            .writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              LiveFunnel.ingest(s, txroot, b, id, route); ()
            }
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        // three ascending-id waves through one checkpoint — commit k
        // IS micro-batch k (the stream_cdc_index transport)
        val maxId = docs.agg(max("doc_id")).first().getLong(0)
        val (c1, c2) = ((maxId + 1) / 3, 2 * (maxId + 1) / 3)
        SnapTable.create(s, landing,
          landingDf.filter(col("doc_id") < c1), "doc_id")
        drain()
        SnapTable.append(s, landing,
          landingDf.filter(col("doc_id") >= c1 &&
            col("doc_id") < c2))
        drain()
        SnapTable.append(s, landing,
          landingDf.filter(col("doc_id") >= c2))
        drain()
        LiveFunnel.serve(s, txroot).orderBy("doc_id")
      },
      // the BATCH ledger oracle, verbatim: the collapsed live
      // changelog must equal the from-scratch funnel decision —
      // transport and incrementality must not change the result
      Some(Wave64Ops.ledgerOracleSql)
    ),
    Q(
      "dedup_crossmodal_serve",
      // survivor-set FRESHNESS across pin moves (VERDICT-r13 task #3):
      // the hybrid_index_serve_incr story applied to the crossmodal
      // DEDUP decision. Wave 0 (even ids, even-even edges) commits its
      // labels; the survivor set is served from pin 1; wave 1 absorbs
      // through the dedup_crossmodal_incr cadence (star-compressed
      // reduced graph, changed labels only); the survivor set is
      // re-served from pin 2. The p2 block must reflect exactly the
      // new pin (read-your-writes for the DEDUP decision) while the
      // p1 block — a plan built against pin 1 and EXECUTED AFTER the
      // wave-1 commit (the union materializes both at the end) —
      // still reproduces pin 1: version-pinned reads resolve
      // manifests eagerly, so a held reader never sees the head move.
      // Oracle: the recursive reachability chain instantiated per pin
      // (even subgraph for p1, full graph for p2). Wave65Spec pins
      // the held-reader re-read explicitly.
      (s, dir) => {
        import graft.sources.{SnapTable, SnapTxn}
        graft.Guard.quadratic(T(s, dir, "documents"),
          "dedup_crossmodal_serve")
        val lex = Wave64Ops.lexPairs(s, dir).persist()
        val (route, gridded, _) = Wave62Ops.semdedupGeometry(s, dir)
        val f = route(gridded).persist()
        val sem = Wave64Ops.semPairs(f).persist()
        val even = (c: String) => col(c) % 2 === 0
        val docs = T(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val txroot = Tmp.dir("graft_xmodal_serve")
        val w0edges = lex.filter(even("a") && even("b"))
          .union(sem.filter(even("a") && even("b")))
        val l0 = Wave64Ops.ccMinLabel(s, docs.filter(even("id")),
          w0edges, "dedup_crossmodal_serve:w0")
        val w0rows = l0.select(lit(0L).as("wave"), col("id"),
          col("comp"))
        SnapTable.createEmpty(s"$txroot/labels", w0rows.schema, "id")
        SnapTxn.init(txroot, Seq("labels"))
        SnapTxn.commit(s, txroot, Seq("labels" -> w0rows),
          note = SnapTxn.batchNote(0L))
        def serveAt(tx: Int, pin: String): DataFrame = {
          val wl = Window.partitionBy("id").orderBy(col("wave").desc)
          SnapTxn.readAt(s, txroot, "labels", tx)
            .withColumn("rn", row_number().over(wl))
            .filter(col("rn") === 1)
            .select(lit(pin).as("pin"), col("id").as("doc_id"),
              col("comp"),
              when(col("id") === col("comp"), 1L).otherwise(0L)
                .as("is_survivor"))
        }
        val p1 = serveAt(SnapTxn.latestTx(txroot), "p1")
        // wave 1: reduced graph = new edges + star links from pin 1
        val prev = SnapTxn.read(s, txroot, "labels")
          .select(col("id"), col("comp"))
        val links = prev.filter(col("id") =!= col("comp"))
          .select(col("id").as("a"), col("comp").as("b"))
        val w1edges = lex.filter(!(even("a") && even("b")))
          .union(sem.filter(!(even("a") && even("b"))))
        val l1 = Wave64Ops.ccMinLabel(s, docs,
          w1edges.union(links), "dedup_crossmodal_serve:w1")
        val changed = l1
          .join(prev.withColumnRenamed("comp", "pcomp"), Seq("id"),
            "left")
          .filter(col("pcomp").isNull || col("pcomp") =!= col("comp"))
          .select(lit(1L).as("wave"), col("id"), col("comp"))
        SnapTxn.commit(s, txroot, Seq("labels" -> changed),
          note = SnapTxn.batchNote(1L))
        lex.unpersist(blocking = false)
        sem.unpersist(blocking = false)
        f.unpersist(blocking = false)
        val p2 = serveAt(SnapTxn.latestTx(txroot), "p2")
        p1.unionByName(p2).orderBy("pin", "doc_id")
      },
      Some(
        "WITH RECURSIVE " + Wave61Ops.gridCellChain("") + ", " +
          "sp AS (SELECT u.vec_id AS a, v.vec_id AS b " +
          "FROM a u JOIN a v ON u.cell = v.cell " +
          "AND u.vec_id < v.vec_id " +
          "WHERE " + Wave64Ops.gridCosSql("u", "v") + " > 0.3), " +
          Wave64Ops.lexPrefixSql +
          "ed AS (SELECT a, b FROM lp UNION SELECT a, b FROM sp), " +
          "ee AS (SELECT a, b FROM ed UNION ALL " +
          "SELECT b, a FROM ed), " +
          "nn AS (SELECT doc_id AS id FROM documents), " +
          // pin 1: the even subgraph (wave-0 state)
          "e1 AS (SELECT a, b FROM ee " +
          "WHERE a % 2 = 0 AND b % 2 = 0), " +
          "n1 AS (SELECT id FROM nn WHERE id % 2 = 0), " +
          "r1(src, node) AS (SELECT id, id FROM n1 " +
          "UNION SELECT r.src, e1.b FROM r1 r JOIN e1 " +
          "ON r.node = e1.a), " +
          "c1 AS (SELECT src AS doc_id, CAST(min(node) AS BIGINT) " +
          "AS comp FROM r1 GROUP BY src), " +
          // pin 2: the full graph
          "r2(src, node) AS (SELECT id, id FROM nn " +
          "UNION SELECT r.src, ee.b FROM r2 r JOIN ee " +
          "ON r.node = ee.a), " +
          "c2 AS (SELECT src AS doc_id, CAST(min(node) AS BIGINT) " +
          "AS comp FROM r2 GROUP BY src) " +
          "SELECT pin, doc_id, comp, is_survivor FROM (" +
          "SELECT 'p1' AS pin, doc_id, comp, " +
          "CAST(CASE WHEN doc_id = comp THEN 1 ELSE 0 END AS BIGINT) " +
          "AS is_survivor FROM c1 " +
          "UNION ALL " +
          "SELECT 'p2' AS pin, doc_id, comp, " +
          "CAST(CASE WHEN doc_id = comp THEN 1 ELSE 0 END AS BIGINT) " +
          "AS is_survivor FROM c2" +
          ") ORDER BY pin, doc_id")
    ),
    Q(
      "text_dedup_minhash_det",
      // the PRODUCTION near-dup candidate rule — banded MinHash-LSH —
      // under the driver's oracle gate (VERDICT-r13 task #6). The
      // seeded integer-hash path (TextAlgs.minhash, the cheap 100-TB
      // variant) can only be spec-pinned; this DERANDOMIZED twin keeps
      // the exact banding structure (16 bands x 4 rows, the house
      // J>~0.7 recall point) but derives every hash from md5 —
      // computable identically in DuckDB — so the banded candidate
      // rule ITSELF is hash-graded, not just the exact-rule twin:
      //   h_i(tok) = md5(i || ':' || tok)            (i in 0..63)
      //   sig_i    = min over tokens (lexicographic on hex)
      //   bhash_b  = md5(sig_{4b} || '|' || ... || sig_{4b+3})
      // Candidates share a (band, bhash) bucket and pass the exact
      // integer AllPairs length bound (5·min >= 4·max for J >= 0.8);
      // the exact-Jaccard verify makes the output a TRUE near-dup set
      // (candidates ⊇ output by construction). Cost is bucket-bounded
      // — O(batch + matching buckets), the e=0.26 economics — with
      // 64 md5s/token as the derandomization premium over the seeded
      // path. Wave65Spec pins banded ⊆ complete-prefix-rule recall on
      // the graded slice.
      (s, dir) => {
        val t = T(s, dir, "documents")
          .filter(col("lang") === "en" &&
            col("source").isin("src0", "src1"))
          .select(col("doc_id"),
            array_sort(array_distinct(split(col("text"), " ")))
              .as("ts"))
          .persist()
        val hs = t
          .select(col("doc_id"), size(col("ts")).as("l"),
            explode(col("ts")).as("tok"))
          .select(col("doc_id"), col("l"), col("tok"),
            explode(expr("sequence(0, 63)")).as("i"))
          .groupBy("doc_id", "l", "i")
          .agg(min(md5(concat(col("i").cast("string"), lit(":"),
            col("tok")))).as("sig"))
        val bd = hs
          .groupBy(col("doc_id"), col("l"),
            expr("i div 4").as("band"))
          .agg(expr("md5(array_join(transform(array_sort(" +
            "collect_list(struct(i, sig))), x -> x.sig), '|'))")
            .as("bhash"))
        val cd = bd.as("x").join(bd.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bhash") === col("y.bhash") &&
              col("x.doc_id") < col("y.doc_id") &&
              col("x.l") * 5 >= col("y.l") * 4 &&
              col("y.l") * 5 >= col("x.l") * 4)
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct()
        val out = Wave64Ops.jaccardVerify(cd, t).orderBy("a", "b")
        t.unpersist(blocking = false)
        out
      },
      Some(
        "WITH t AS (SELECT doc_id, " +
          "list_sort(list_distinct(string_split(text, ' '))) AS ts " +
          "FROM documents WHERE lang = 'en' " +
          "AND source IN ('src0','src1')), " +
          "tok AS (SELECT doc_id, len(ts) AS l, unnest(ts) AS tok " +
          "FROM t), " +
          "hs AS (SELECT doc_id, l, i, " +
          "min(md5(CAST(i AS VARCHAR) || ':' || tok)) AS sig " +
          "FROM tok CROSS JOIN " +
          "(SELECT unnest(generate_series(0, 63)) AS i) h " +
          "GROUP BY doc_id, l, i), " +
          "bd AS (SELECT doc_id, l, i // 4 AS band, " +
          "md5(string_agg(sig, '|' ORDER BY i)) AS bhash " +
          "FROM hs GROUP BY doc_id, l, i // 4), " +
          "cd AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b " +
          "FROM bd x JOIN bd y ON x.band = y.band " +
          "AND x.bhash = y.bhash AND x.doc_id < y.doc_id " +
          "AND x.l * 5 >= y.l * 4 AND y.l * 5 >= x.l * 4) " +
          "SELECT cd.a, cd.b FROM cd " +
          "JOIN t u ON u.doc_id = cd.a JOIN t v ON v.doc_id = cd.b " +
          "WHERE round(CAST(len(list_intersect(u.ts, v.ts)) " +
          "AS DOUBLE) / (len(u.ts) + len(v.ts) " +
          "- len(list_intersect(u.ts, v.ts))), 6) >= 0.8 " +
          "ORDER BY a, b")
    )
  )
}
