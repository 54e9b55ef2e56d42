package graft.ops

import graft.{Q, QueryModule, T, Tmp}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * than asserting it). Plus `dedup_crossmodal_serve` (freshness across
  * pin moves for the dedup decision) and `text_dedup_minhash_det`
  * (the banded candidate rule under the oracle gate).
  *
  * Why decisions must be a CHANGELOG, not a write-once log: later
  * arrivals legitimately change earlier verdicts —
  *  - an out-of-order SMALLER id with an already-seen fingerprint
  *    DEMOTES the group's keeper: the old keeper flips to
  *    `exact_dup`, every group member's kept_by moves, and the
  *    group's stage-4/5 representative swaps;
  *  - a new doc can bridge two stage-4 near-dup components, so a doc
  *    that was its component's min flips to `near_dup`;
  *  - either flip REMOVES a doc from the stage-5 semdedup graph, so a
  *    doc that had been semdedup'd INTO it can flip back to
  *    `survived` (its component re-splits around the removal).
  * The ledger is therefore an append-only (wave, doc_id, decision)
  * changelog under SnapTxn; serving collapses to the latest wave per
  * doc. The maintenance discipline `dedup_crossmodal_incr` proved for
  * one CC table, extended to the full five-stage funnel with
  * REPRESENTATIVE SWAPS and DELETIONS.
  *
  * ARRIVAL ORDER: arbitrary. No ascending-id contract (the round-14
  * first cut had one; this generalization removed it) — the only
  * guard is that a doc_id lands once. What makes arbitrary order
  * tractable is running stage 4 in FINGERPRINT SPACE: the stage-4
  * graph's nodes are fp groups keyed by a STABLE `fp_id` (the
  * first-sight doc id), and the STORED edges are CONTENT edges
  * (exact Jaccard, no block condition) — stable and append-only,
  * because token sets never change and groups never leave. The batch
  * funnel's (lang, source) blocking is applied as a FILTER at CC
  * time against each group's CURRENT KEEPER attributes: a group CAN
  * span sources (lang is group-invariant among gate survivors —
  * identical text, one prediction — but source is free metadata), so
  * a keeper demotion can MOVE a group's block, adding and removing
  * FILTERED edges without touching the stored graph. CC is therefore
  * maintained as delta-CC with deletions at stage 4 too: perturbed
  * nodes (new groups + block-moved groups) plus their live
  * neighbors' components are recomputed from the re-filtered stored
  * edges; everything else keeps its label (closure: an edge between
  * two attr-unchanged groups has an unchanged filter verdict, and if
  * it passed before, CC already placed both endpoints in one
  * component). The published stage-4 component min is
  * `dmin(comp) = min(current keeper)` over the component's groups —
  * a rollup of the group table, never graph surgery. The stage-5
  * graph then sees rep additions (provably only from the current
  * batch: dmin is non-increasing) plus rep removals — the same
  * affected-component delta-CC.
  *
  * Per-batch cost (the 100-TB argument):
  *  - gates are row-local (O(batch));
  *  - stage 3 probes the group table on fp (O(batch + hits));
  *  - stage 4 probes the PREFIX index with the complete
  *    PPJoin/AllPairs candidate rule (prefix-collision-bounded; hot
  *    collision groups SPLIT across salt buckets rather than failing
  *    — Wave66Ops.gridSaltedProbeCandidates) for NEW groups only,
  *    and runs CC over the
  *    STAR-COMPRESSED reduced graph (new edges + one id→comp link per
  *    labeled group — per-absorb rounds track the NEW edges'
  *    diameter, never the corpus's);
  *  - stage 5 is delta-CC WITH DELETIONS: only components touched by
  *    a new edge or a removed rep are recomputed, from their
  *    cell-bounded edges re-derived inside the affected (cell, scell)
  *    buckets. Closure: an edge never crosses two components, so
  *    every node whose label can change lies in an affected one.
  *  - the changelog collapses and the dmin rollup read
  *    O(corpus-so-far) rows per batch — the dedup_crossmodal_incr
  *    accepted cost; at 100 TB these live as SnapTables keyed by
  *    doc/fp (merge-on-read) and the collapse is the standard
  *    changelog compaction `table_txn_compact` already owns.
  * All seven state tables commit in ONE SnapTxn per micro-batch with
  * the batch id in the note — idempotent replay, restart durability,
  * and a crash mid-absorb leaves only unpinned orphans. Wave65Spec
  * forces the demotion/flip paths on a purpose-built fixture with
  * OUT-OF-ORDER waves and pins replay/guards; the graded op runs the
  * landing-table transport with deliberately non-monotone wave order
  * (mid / low / high id tertiles).
  *
  * The stage-4 candidate rule here is the COMPLETE deterministic
  * prefix filter under a BOOTSTRAP-FROZEN df-ascending token order
  * (committed as the `tokord` table at setup; unseen tokens order
  * last, ties by token — one static total order across every wave, so
  * completeness holds for any future vocabulary while Zipfian corpora
  * get the rare-token prefixes the batch ops' prefixRowsDf measured
  * 2.3× at 10×; Guard.quadratic-fenced like every exactness twin).
  * The unfenced production swap is IncNeardup's banded MinHash probe
  * behind the same verify (e=0.26), at the price of the completeness
  * guarantee the oracle needs.
  */
object Wave65Ops extends QueryModule {

  /** The transactional live-funnel cadence, factored out of the
    * streaming sink so specs (and a restarted query) drive it
    * directly. State tables (one txroot, pinned together):
    *  - ledger(wave, doc_id, dropped_at, reason, kept_by, n_toks, fp)
    *    — the decision changelog (the graded artifact; fp is the
    *    internal re-decision key, null for gate-dropped docs);
    *  - fps(wave, fp, fp_id, keeper, lang, source) — fingerprint
    *    GROUP changelog: fp_id is the stable first-sight doc id (the
    *    stage-4 node id), keeper the current min doc id, lang/source
    *    the CURRENT keeper's block attributes (demotions append);
    *  - pref(doc_id=fp_id, len, ptok) + ts4(doc_id=fp_id, ts) —
    *    block-free stage-4 prefix index + token sets, one row set per
    *    GROUP (members share the token set);
    *  - edges4(a, b) — CONTENT edges in fp_id space (exact Jaccard,
    *    no block condition): stable, append-only; the (lang, source)
    *    block is a CC-time filter against current keeper attrs;
    *  - labels4(wave, id=fp_id, comp) — stage-4 CC changelog (delta
    *    recomputes of affected components);
    *  - labels5(wave, id=doc_id, comp) — stage-5 CC changelog over
    *    ever-reps (stale rows masked by the membership semi-join);
    *  - vecidx(vec_id, cell, scell, g) — routed vectors of EVERY gate
    *    survivor with a vector (append-only; a component split can
    *    hand rep status to an old doc, whose vector must be findable).
    */
  object LiveFunnel {
    import graft.sources.{SnapTable, SnapTxn}

    val Tables: Seq[String] =
      Seq("ledger", "fps", "pref", "ts4", "edges4", "labels4",
        "labels5", "vecidx", "tokord")

    /** Latest-wave row per key. Every changelog writes at most ONE row
      * per key per wave, so `max_by(..., wave)` is deterministic and
      * identical to the former row_number-window form — as a partial
      * aggregation it collapses map-side BEFORE the exchange (guide
      * §2.3) instead of shuffling and sorting every changelog row. */
    private def latestBy(df: DataFrame, key: String): DataFrame = {
      val others = df.columns.filterNot(_ == key)
      df.groupBy(col(key))
        .agg(max_by(struct(others.map(col): _*), col("wave")).as("_s"))
        .select(col(key) +: others.map(c => col(s"_s.$c").as(c)): _*)
    }

    /** Setup from a ZERO-ROW landing frame `(doc_id, lang, source,
      * text, n_chars, g)` (`g` = grid-quantized vector, null = none)
      * plus a BOOTSTRAP corpus for the frozen token order: the
      * df-ascending prefix ordering (the canonical AllPairs order,
      * 2.3× at 10× on the Zipfian twin — see prefixRowsDf) needs ONE
      * order across every wave, so the document frequencies are
      * FROZEN from `bootstrap` at setup and committed as the `tokord`
      * table — the IVF frozen-geometry invariant applied to tokens.
      * Tokens unseen by the bootstrap order AFTER every seen token
      * (df = +∞), ties by token — still one deterministic total
      * order, so the prefix filter stays complete for any future
      * vocabulary. Everything else is DDL-only (plan-only, no jobs);
      * the tokord build is the one bootstrap-sized job, exactly like
      * semdedupGeometry's centroid derivation. */
    def setup(s: SparkSession, txroot: String, landing0: DataFrame,
        route: DataFrame => DataFrame, bootstrap: DataFrame): Unit = {
      val led = StructType(Seq(
        StructField("wave", LongType, nullable = false),
        StructField("doc_id", LongType),
        StructField("dropped_at", LongType),
        StructField("reason", StringType),
        StructField("kept_by", LongType),
        StructField("n_toks", LongType),
        StructField("fp", StringType)))
      SnapTable.createEmpty(s"$txroot/ledger", led, "doc_id")
      SnapTable.createEmpty(s"$txroot/fps", StructType(Seq(
        StructField("wave", LongType, nullable = false),
        StructField("fp", StringType),
        StructField("fp_id", LongType),
        StructField("keeper", LongType),
        StructField("lang", StringType),
        StructField("source", StringType))), "keeper")
      val t40 = landing0.select(col("doc_id"),
        array_sort(array_distinct(split(col("text"), " "))).as("ts"))
      SnapTable.createEmpty(s"$txroot/pref",
        Wave64Ops.prefixRows(t40, Nil).schema, "doc_id")
      SnapTable.createEmpty(s"$txroot/ts4",
        t40.select("doc_id", "ts").schema, "doc_id")
      SnapTable.createEmpty(s"$txroot/edges4", StructType(Seq(
        StructField("a", LongType),
        StructField("b", LongType))), "a")
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
      SnapTable.createEmpty(s"$txroot/tokord", StructType(Seq(
        StructField("tok", StringType),
        StructField("df", LongType))), "df")
      SnapTxn.init(txroot, Tables)
      SnapTxn.commit(s, txroot, Seq("tokord" ->
        bootstrap.select(explode(array_distinct(
            split(col("text"), " "))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("df"))),
        note = "bootstrap:tokord")
    }

    /** [[Wave64Ops.prefixRows]] under the FROZEN bootstrap df order:
      * (df asc, tok) with unseen tokens last. Same output shape
      * `(doc_id, len, ptok)` — index and probe sides share it. */
    private def frozenPrefixRows(t4: DataFrame,
        ord: DataFrame): DataFrame =
      t4.select(col("doc_id"), size(col("ts")).as("len"),
          explode(col("ts")).as("tok"))
        .join(ord, Seq("tok"), "left")
        .withColumn("df", coalesce(col("df"), lit(Long.MaxValue)))
        .groupBy("doc_id", "len")
        .agg(expr("transform(array_sort(collect_list(" +
          "struct(df, tok))), x -> x.tok)").as("ots"))
        .select(col("doc_id"), col("len"),
          explode(expr("slice(ots, 1, " +
            "CAST(floor(len * 0.2) AS INT) + 1)")).as("ptok"))

    /** One micro-batch: gates → group probe (keeper updates, any id
      * order) → prefix-index probe + star-compressed CC in fp space →
      * rep rollup → affected-component delta-CC → decision diff — all
      * seven tables absorbed in ONE transaction. Idempotent (a
      * replayed batch id is a no-op, -1). Returns ledger delta
      * rows. */
    def ingest(s: SparkSession, txroot: String, batch: DataFrame,
        batchId: Long, route: DataFrame => DataFrame): Long = {
      if (SnapTxn.batchAbsorbed(txroot, batchId)) return -1L
      val w = lit(batchId).as("wave")
      val nullL = lit(null).cast("long")
      // every intermediate goes through the honest-stats LOCAL
      // CHECKPOINT, not persist: the wave's frames reference each
      // other ~3 levels deep and several times each, and persist
      // caches DATA but not PLAN size — the nested analyzed trees
      // multiply until explainString alone OOMs the driver (the
      // round-13 ccMinLabel incident, reproduced here by the first
      // persist-based cut of this function). The checkpoint truncates
      // lineage AND swaps in measured stats (broadcast decisions stay
      // honest). Blocks are short-lived per wave and GC'd.
      def p(df: DataFrame): DataFrame =
        org.apache.spark.sql.graftx.Bridge
          .localCheckpointHonestStats(df)
      // (r15, VERDICT-r14 #7) the WHOLE wave plans in an isolated
      // cloned session — the ccMinLabel discipline applied to the
      // ingest itself: the shuffle-width override below mutates only
      // the clone, so a concurrent query on the caller's session can
      // never observe (or stomp) wave-scoped conf, and no try/finally
      // restore is needed. State reads go through `iso`; the incoming
      // batch is rebound into it.
      val iso = org.apache.spark.sql.graftx.Bridge.isolatedSession(s)
      val partsKey = "spark.sql.shuffle.partitions"
      // dev-only section timer (GRAFT_PROF_INGEST=1): wall per phase
      val profT0 = new java.util.concurrent.atomic.AtomicLong(
        System.nanoTime())
      def mark(tag: String): Unit =
        if (sys.env.contains("GRAFT_PROF_INGEST")) {
          val now = System.nanoTime()
          println(f"INGEST b$batchId $tag%-12s " +
            f"${(now - profT0.get()) / 1e9}%6.2f s")
          profT0.set(now)
        }
      // (r15, VERDICT-r14 #1) the four state collapses and the batch
      // projection are INDEPENDENT eager checkpoints: overlap their
      // per-job latency from a bounded pool (guide §2.6) instead of
      // serializing five driver round-trips per wave. The row counts
      // the width decision needs ride as observe() metrics on the
      // materializations already paid — the two separate count() jobs
      // are gone (local-mode-exact, same caveat as ccMinLabel's
      // convergence metrics).
      val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
      def fut(f: => DataFrame)
          : java.util.concurrent.Future[DataFrame] =
        pool.submit(new java.util.concurrent.Callable[DataFrame] {
          override def call(): DataFrame = f
        })
      def get[A](f: java.util.concurrent.Future[A]): A =
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      try {
        val obsLed = org.apache.spark.sql.Observation()
        val obsB = org.apache.spark.sql.Observation()
        val fLedger = fut(p(latestBy(
            SnapTxn.read(iso, txroot, "ledger"), "doc_id")
          .observe(obsLed, count(lit(1)).as("n"))))
        val fFps = fut(p(latestBy(SnapTxn.read(iso, txroot, "fps"),
            "fp")
          .select("fp", "fp_id", "keeper", "lang", "source")))
        val fL4 = fut(p(latestBy(SnapTxn.read(iso, txroot, "labels4"),
          "id").select("id", "comp")))
        val fL5 = fut(p(latestBy(SnapTxn.read(iso, txroot, "labels5"),
          "id").select("id", "comp")))
        val fB0 = fut(p(org.apache.spark.sql.graftx.Bridge
          .inSession(iso, batch)
          .select(col("doc_id"), col("lang"), col("source"),
            col("text"), col("n_chars"), col("g"))
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_toks", size(col("toks")).cast("long"))
          .observe(obsB, count(lit(1)).as("n"))))
        val prevLedger = get(fLedger)
        val prevFps = get(fFps)
        val prevL4 = get(fL4)
        val prevL5 = get(fL5)
        val b0 = get(fB0)
        mark("collapses")
        // a doc_id lands exactly once — the only arrival guard. The
        // check is read-only and the wave's single side effect is the
        // SnapTxn.commit at the end, so it runs CONCURRENTLY with the
        // wave (both join sides are cached checkpoint blocks) and is
        // required to have landed clean just before the commit.
        val fDup = pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            b0.join(prevLedger, Seq("doc_id"), "left_semi")
              .limit(1).count()
        })
        // shuffle width follows the DATA (the ccMinLabel/Wave55
        // discipline): an ingest wave runs ~30 small exchanges over
        // state + batch frames; core-count width just multiplies
        // task-scheduling overhead at fixture scale while the corpus-
        // sized collapses size it up at 100 TB (~250k rows/partition,
        // floor 4). Counts come from the observations above; the
        // override lands on the CLONE only. ccMinLabel runs its own
        // width in its own clone — neither sees the other.
        def obsN(o: org.apache.spark.sql.Observation): Long =
          o.get.get("n").map(_.asInstanceOf[Long]).getOrElse(0L)
        iso.conf.set(partsKey, math.max(4L,
          (obsN(obsLed) + obsN(obsB)) / 250000L).toString)
        mark("width+dup")
        // stages 1-2: row-local gates
        val s1B = b0.filter(TextOps.langIdExpr(col("text")) ===
          col("lang"))
        val s2B = p(s1B.filter(Wave64Ops.qualityScore >= 0.5)
          .withColumn("fp", md5(concat_ws(" ",
            array_sort(array_distinct(col("toks")))))))
        mark("gates")
        // the published stage-4 min is over CURRENT keepers — a
        // rollup of the group table, never graph surgery
        def dminOf(groups: DataFrame, labels: DataFrame): DataFrame =
          groups.join(labels.withColumnRenamed("id", "fp_id"),
              Seq("fp_id"))
            .groupBy("comp").agg(min("keeper").as("dmin"))
        // (r15) stage-5-INDEPENDENT prep overlaps stages 3-4 and the
        // stage-4 delta-CC (guide §2.6): the routed vector delta, the
        // accumulated vector index, the previous pin's rep set and the
        // previous stage-5 membership depend only on the state
        // collapses and the gated batch — never on the stage-3/4
        // outcome — so their eager checkpoints run from the pool while
        // the main thread works the prefix probe and cc4.
        val fS5 = pool.submit(new java.util.concurrent.Callable[
            (DataFrame, DataFrame, DataFrame, DataFrame)] {
          override def call()
              : (DataFrame, DataFrame, DataFrame, DataFrame) = {
            val repsPrev = p(dminOf(prevFps, prevL4)
              .select(col("dmin").as("id")))
            val vecDelta = p(route(
              s2B.filter(col("g").isNotNull)
                .select(col("doc_id").as("vec_id"), col("g"))))
            val vecAll = p(SnapTxn.read(iso, txroot, "vecidx")
              .unionByName(vecDelta))
            val prevM5 = p(prevL5
              .join(repsPrev, Seq("id"), "left_semi")
              .join(vecAll.select(col("vec_id").as("id")), Seq("id"),
                "left_semi"))
            (repsPrev, vecDelta, vecAll, prevM5)
          }
        })
        // stage 3: GROUP-level keeper maintenance — order-free. The
        // batch min per fp either founds a new group (fp_id = that
        // doc, stable forever) or DEMOTES the keeper when smaller.
        // The group carries its CURRENT KEEPER's (lang, source): the
        // batch funnel blocks stage 4 on the keeper doc's attributes,
        // and a group CAN span sources (lang is group-invariant among
        // gate survivors — identical text, one prediction — but
        // source is free metadata), so a demotion can MOVE the
        // group's block.
        val bmin = s2B.groupBy("fp").agg(min("doc_id").as("bmin"))
          .join(s2B.select(col("fp"), col("doc_id").as("bmin"),
            col("lang"), col("source")), Seq("fp", "bmin"))
        val fpJ = p(bmin.join(prevFps
            .withColumnRenamed("lang", "plang")
            .withColumnRenamed("source", "psource"),
          Seq("fp"), "left"))
        // (r14) narrow filters over the checkpointed fpJ — re-use is
        // a cached-block scan, another eager checkpoint buys nothing
        val newGroups = fpJ.filter(col("fp_id").isNull)
          .select(col("fp"), col("bmin").as("fp_id"),
            col("bmin").as("keeper"), col("lang"), col("source"))
        val demoted = fpJ.filter(col("fp_id").isNotNull &&
            col("bmin") < col("keeper"))
          .select(col("fp"), col("fp_id"), col("bmin").as("keeper"),
            col("lang"), col("source"), col("plang"),
            col("psource"))
        val fpsDelta = newGroups
          .unionByName(demoted.drop("plang", "psource"))
          .select(w, col("fp"), col("fp_id"), col("keeper"),
            col("lang"), col("source"))
        val fpsNow = p(prevFps
          .join(fpsDelta.select("fp"), Seq("fp"), "left_anti")
          .unionByName(fpsDelta.drop("wave")))
        mark("stage3")
        // stage 4, fp space. The stored graph is CONTENT edges
        // (exact Jaccard >= 0.8, NO block condition) — those are
        // stable and append-only (token sets never change, groups
        // never leave), so new groups probe once, block-free. The
        // batch's (lang, source) blocking is applied as a FILTER at
        // CC time against the groups' CURRENT keeper attributes:
        // a demotion that moves a group's block adds/removes
        // filtered edges without touching the stored graph.
        val t4B = p(s2B
          .join(newGroups.select(col("fp_id").as("doc_id")),
            Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            array_sort(array_distinct(col("toks"))).as("ts")))
        mark("s4:t4B")
        val prefB = p(frozenPrefixRows(t4B,
          SnapTxn.read(iso, txroot, "tokord")))
        mark("s4:prefB")
        val allPref = p(SnapTxn.read(iso, txroot, "pref")
          .unionByName(prefB))
        // hot collision groups SPLIT instead of failing (§18.1 #3): a
        // landing wave must not abort the stream, so the probe join
        // runs through the grid-salted bipartite rule — per-bucket
        // work capped at PrefixGroupCap², completeness structural
        // (every probe/index pair meets in exactly one salt bucket),
        // candidates identical to the direct join. The batch exactness
        // twins keep the loud fence; the LIVE cadence eats the group.
        // Arrival order is arbitrary, so a new group's id can sit on
        // either side of an indexed one — the rule canonicalizes with
        // least/greatest instead of assuming newer = larger.
        mark("s4:allPref")
        val cand = Wave66Ops.gridSaltedProbeCandidates(prefB, allPref,
          Nil, Wave64Ops.PrefixGroupCap)
        val candP = if (!sys.env.contains("GRAFT_PROF_INGEST")) cand
          else {
            val c = p(cand)
            println(s"INGEST b$batchId s4:cand rows=${c.count()}")
            mark("s4:cand")
            c
          }
        val newContent = p(Wave64Ops.jaccardVerify(candP,
          SnapTxn.read(iso, txroot, "ts4")
            .unionByName(t4B.select("doc_id", "ts"))))
        if (sys.env.contains("GRAFT_PROF_INGEST"))
          println(s"INGEST b$batchId s4:verified rows=" +
            newContent.count())
        mark("s4:verify")
        val edgesAll = SnapTxn.read(iso, txroot, "edges4")
          .unionByName(newContent)
        // current-block filter: an edge is LIVE iff both groups'
        // keeper attrs match (one O(edges) attr join per wave — the
        // accepted changelog-read cost class)
        val attrs = fpsNow.select(col("fp_id"), col("lang"),
          col("source"))
        val liveEdges = p(edgesAll
          .join(attrs.select(col("fp_id").as("a"),
            col("lang").as("la"), col("source").as("sa")), Seq("a"))
          .join(attrs.select(col("fp_id").as("b"),
            col("lang").as("lb"), col("source").as("sb")), Seq("b"))
          .filter(col("la") === col("lb") && col("sa") === col("sb"))
          .select("a", "b"))
        mark("s4:liveEdges")
        // delta-CC with deletions (the stage-5 machinery at stage 4):
        // perturbed nodes = new groups + groups whose block MOVED;
        // affected comps = their prev comps plus the prev comps of
        // their live neighbors (closure: an edge between two
        // attr-UNCHANGED groups has an unchanged filter verdict, and
        // if it passed before, CC already put both in one comp)
        val attrChanged = demoted
          .filter(col("lang") =!= col("plang") ||
            col("source") =!= col("psource"))
          .select(col("fp_id").as("id"))
        val perturbed = attrChanged
          .union(newGroups.select(col("fp_id").as("id")))
        val nbrs = liveEdges
          .join(perturbed.withColumnRenamed("id", "a"), Seq("a"),
            "left_semi")
          .select(col("b").as("id"))
          .union(liveEdges
            .join(perturbed.withColumnRenamed("id", "b"), Seq("b"),
              "left_semi")
            .select(col("a").as("id")))
        val affected4c = perturbed.union(nbrs)
          .join(prevL4, Seq("id"))
          .select("comp").distinct()
        val subG4 = p(prevL4
          .join(affected4c, Seq("comp"), "left_semi")
          .select("id")
          .union(newGroups.select(col("fp_id").as("id")))
          .distinct())
        val subE4 = liveEdges
          .join(subG4.withColumnRenamed("id", "a"), Seq("a"),
            "left_semi")
          .join(subG4.withColumnRenamed("id", "b"), Seq("b"),
            "left_semi")
        mark("stage4prep")
        val newSubL4 = Wave64Ops.ccMinLabel(iso, subG4, subE4,
          s"pipe_curation_live:near:b$batchId")
        val newL4 = p(prevL4
          .join(subG4, Seq("id"), "left_anti")
          .unionByName(newSubL4))
        val l4Delta = p(newL4
          .join(prevL4.withColumnRenamed("comp", "pcomp"), Seq("id"),
            "left")
          .filter(col("pcomp").isNull || col("pcomp") =!= col("comp"))
          .select(w, col("id"), col("comp")))
        mark("cc4")
        val dminNow = p(dminOf(fpsNow, newL4))
        // (r14) narrow select over the checkpointed dminNow
        val repsNow = dminNow.select(col("dmin").as("id"))
        // join the overlapped stage-5 prep (see fS5 above)
        val (repsPrev, vecDelta, vecAll, prevM5) = get(fS5)
        val removedReps = repsPrev.join(repsNow, Seq("id"),
          "left_anti")
        // NOT necessarily ⊆ this batch: a block-moved group can SPLIT
        // a component, and the label-retaining side's dmin can rise —
        // an OLD doc regains rep status. Hence vecidx stores EVERY
        // gate survivor's routed vector (O(batch) rows per wave), not
        // just ever-reps': a regained rep's vector must be findable.
        val addedReps = repsNow.join(repsPrev, Seq("id"), "left_anti")
        mark("dmin")
        // stage 5: delta-CC with deletions over affected components
        // (vecDelta / vecAll / prevM5 were checkpointed by fS5 while
        // stages 3-4 ran)
        val addedRouted = vecAll.join(
          addedReps.withColumnRenamed("id", "vec_id"), Seq("vec_id"),
          "left_semi")
        val memRouted = vecAll.join(
          repsNow.withColumnRenamed("id", "vec_id"), Seq("vec_id"),
          "left_semi")
        val removed5 = removedReps
          .join(vecAll.select(col("vec_id").as("id")), Seq("id"),
            "left_semi")
        val newEdges5 = p(Wave62Ops.VecStreamIndex
          .probeHits(addedRouted, memRouted)
          .filter(col("vec_a") =!= col("vec_b"))
          .select(col("vec_a").as("a"), col("vec_b").as("b"))
          .distinct())
        val affected = newEdges5.select(col("a").as("id"))
          .union(newEdges5.select(col("b").as("id")))
          .union(removed5)
          .join(prevM5, Seq("id"))
          .select("comp").distinct()
        val subOld = prevM5
          .join(affected, Seq("comp"), "left_semi")
          .join(removed5, Seq("id"), "left_anti")
          .select("id")
        val subNodes = p(subOld
          .union(addedRouted.select(col("vec_id").as("id"))))
        val subRouted = p(vecAll.join(
          subNodes.withColumnRenamed("id", "vec_id"), Seq("vec_id"),
          "left_semi"))
        mark("stage5prep")
        // ccMinLabel already returns a checkpoint-backed frame
        val newSubL5 = Wave64Ops.ccMinLabel(iso, subNodes,
          Wave64Ops.semPairs(subRouted),
          s"pipe_curation_live:sem:b$batchId")
        mark("cc5")
        // NOT checkpointed (r15): consumed exactly once (the commit's
        // write job), and its plan is one shallow join over two
        // checkpointed frames — the eager materialization was a pure
        // extra driver job at any scale
        val l5Delta = newSubL5
          .join(prevL5.withColumnRenamed("comp", "pcomp"), Seq("id"),
            "left")
          .filter(col("pcomp").isNull || col("pcomp") =!= col("comp"))
          .select(w, col("id"), col("comp"))
        val comp5Now = prevM5
          .join(subNodes, Seq("id"), "left_anti")
          .join(removed5, Seq("id"), "left_anti")
          .union(newSubL5)
        mark("l5delta")
        // ---- decisions. One function of (doc_id, fp): keeper test →
        // rep test → stage-5 membership/label → survived. Matches the
        // batch funnel's semantics exactly.
        def decide(targets: DataFrame): DataFrame =
          targets
            .join(fpsNow, Seq("fp"))
            .join(newL4.withColumnRenamed("id", "fp_id"),
              Seq("fp_id"))
            .join(dminNow, Seq("comp"))
            .join(comp5Now.select(col("id").as("doc_id"),
              col("comp").as("c5")), Seq("doc_id"), "left")
            .select(col("doc_id"), col("n_toks"), col("fp"),
              col("is_new"),
              when(col("doc_id") =!= col("keeper"), lit(3L))
                .when(col("doc_id") =!= col("dmin"), lit(4L))
                .when(col("c5").isNotNull &&
                  col("c5") =!= col("doc_id"), lit(5L))
                .otherwise(lit(0L)).as("dropped_at"),
              when(col("doc_id") =!= col("keeper"), col("keeper"))
                .when(col("doc_id") =!= col("dmin"), col("dmin"))
                .when(col("c5").isNotNull &&
                  col("c5") =!= col("doc_id"), col("c5"))
                .otherwise(nullL).as("kept_by"))
            .withColumn("reason",
              when(col("dropped_at") === 3L, "exact_dup")
                .when(col("dropped_at") === 4L, "near_dup")
                .when(col("dropped_at") === 5L, "sem_dup")
                .otherwise("survived"))
        // old docs whose verdict can have moved: every doc of every
        // group in a stage-4-affected component — under the NEW
        // labeling AND the PREV one (a block-move split can leave the
        // label-retaining side with no delta row of its own, yet its
        // dmin rose when the departed group took the old minimum),
        // plus the stage-5 recompute set. Every perturbation seeds
        // fpsDelta (demotions/new groups), so the closure is anchored.
        val seed4 = fpsDelta.select(col("fp_id").as("id"))
          .union(l4Delta.select("id")).distinct()
        def compCover(labels: DataFrame): DataFrame =
          fpsNow
            .join(labels.withColumnRenamed("id", "fp_id"),
              Seq("fp_id"))
            .join(labels.join(seed4, Seq("id"), "left_semi")
              .select("comp").distinct(), Seq("comp"), "left_semi")
            .select("fp")
        val affectedFps = compCover(newL4).union(compCover(prevL4))
        val oldCand = prevLedger
          .join(affectedFps, Seq("fp"), "left_semi")
          .select("doc_id", "fp", "n_toks")
          .unionByName(prevLedger
            .join(subNodes.union(removed5)
                .withColumnRenamed("id", "doc_id"),
              Seq("doc_id"), "left_semi")
            .select("doc_id", "fp", "n_toks"))
          .distinct()
        val decP = p(decide(
          s2B.select(col("doc_id"), col("fp"), col("n_toks"))
            .withColumn("is_new", lit(true))
            .unionByName(oldCand.withColumn("is_new", lit(false)))))
        def ledgerRow(df: DataFrame, stage: Long, why: String)
            : DataFrame =
          df.select(w, col("doc_id"), lit(stage).as("dropped_at"),
            lit(why).as("reason"), nullL.as("kept_by"),
            col("n_toks"), lit(null).cast("string").as("fp"))
        val ledgerDelta =
          ledgerRow(b0.filter(!(TextOps.langIdExpr(col("text")) ===
            col("lang"))), 1L, "lang_mismatch")
          .unionByName(ledgerRow(
            s1B.filter(!(Wave64Ops.qualityScore >= 0.5)), 2L,
            "low_quality"))
          .unionByName(decP.filter(col("is_new"))
            .select(w, col("doc_id"), col("dropped_at"),
              col("reason"), col("kept_by"), col("n_toks"),
              col("fp")))
          .unionByName(decP.filter(!col("is_new"))
            .join(prevLedger.select(col("doc_id"),
              col("dropped_at").as("pd"), col("kept_by").as("pk")),
              Seq("doc_id"))
            .filter(!(col("dropped_at") <=> col("pd")) ||
              !(col("kept_by") <=> col("pk")))
            .select(w, col("doc_id"), col("dropped_at"),
              col("reason"), col("kept_by"), col("n_toks"),
              col("fp")))
        mark("decide")
        // the ledger-delta row count rides on the checkpoint
        // materialization (one job, not two)
        val obsN5 = org.apache.spark.sql.Observation()
        val ledgerP = p(ledgerDelta
          .observe(obsN5, count(lit(1)).as("n")))
        val n = obsN5.get.apply("n").asInstanceOf[Long]
        mark("ledgercount")
        // the deferred arrival guard must land clean BEFORE the wave's
        // only side effect
        require(get(fDup) == 0L,
          s"pipe_curation_live: batch $batchId re-lands an absorbed " +
            "doc_id — ids are assigned once at ingest")
        SnapTxn.commit(iso, txroot, Seq(
          "ledger" -> ledgerP,
          "fps" -> fpsDelta,
          "pref" -> prefB.toDF(),
          "ts4" -> t4B.select("doc_id", "ts"),
          "edges4" -> newContent.toDF(),
          "labels4" -> l4Delta,
          "labels5" -> l5Delta,
          "vecidx" -> vecDelta.toDF()),
          note = SnapTxn.batchNote(batchId))
        mark("commit")
        n
      } finally pool.shutdown()
    }

    /** The decision set as of the current pin: the changelog collapsed
      * to its latest row per doc. */
    def serve(s: SparkSession, txroot: String): DataFrame =
      latestBy(SnapTxn.read(s, txroot, "ledger"), "doc_id")
        .select("doc_id", "dropped_at", "reason", "kept_by")

    /** REFREEZE the frozen token order (SURVEY §18.2 follow-through on
      * the §18 "bootstrap-frozen df order" note): the bootstrap order
      * drifts as the live vocabulary diverges from the setup corpus —
      * completeness never breaks (ANY one total order is complete, and
      * unseen tokens order last), but the Zipfian measurement
      * (prefixRowsDf, 2.3× at 10×) is about COLLISION DENSITY, which a
      * stale order slowly gives back. This is the IVF re-clustering
      * problem on the token side, solved the same way: an ACID
      * maintenance commit (`SnapTxn.rewritePinned`, the
      * table_txn_compact shape) that rebuilds `tokord` from the
      * accumulated group token sets (`ts4` IS the stage-4 universe —
      * the natural drift-corrected df source) and REBUILDS the entire
      * `pref` index under the new order in the SAME tx record: probe
      * and index can never disagree on the order, because the switch
      * is one atomic pin move. Decisions are INVARIANT under refreeze
      * (the candidate rule's output is verify-filtered, so a different
      * complete order yields the same pairs) — which is exactly what
      * the graded op's oracle proves by running the batch ledger SQL
      * against a mid-stream-refrozen cadence. Single-writer
      * maintenance like every rewritePinned verb: run between waves,
      * not during one. Returns the maintenance tx version. */
    /** The STANDING-cadence entry point: refreeze only when the frozen
      * order has actually drifted. Drift metric = the fraction of the
      * stage-4 universe's DISTINCT tokens absent from `tokord` —
      * unseen tokens all tie at df = +∞, so their prefix ordering is
      * uninformed (the fallback lexicographic tail is exactly where
      * the Zipf-head collisions live; the RefreezeDrift rehearsal
      * measured a 2.1–6.1× stale-wave penalty). One distinct + one
      * anti-join over token rows — noise next to a single ingest
      * wave. Returns the maintenance tx version, or -1 when drift is
      * at or below the threshold (nothing committed). Callers running
      * a real stream would invoke this between micro-batches at
      * whatever period amortizes the ~seconds rebuild cost. */
    def refreezeIfDrifted(s: SparkSession, txroot: String,
        maxUnseenFrac: Double = 0.2): Int = {
      val toks = SnapTxn.read(s, txroot, "ts4")
        .select(explode(col("ts")).as("tok")).distinct()
      val total = toks.count()
      if (total == 0L) return -1
      val unseen = toks.join(SnapTxn.read(s, txroot, "tokord"),
        Seq("tok"), "left_anti").count()
      if (unseen.toDouble / total <= maxUnseenFrac) -1
      else refreeze(s, txroot)
    }

    def refreeze(s: SparkSession, txroot: String): Int = {
      val ts4 = SnapTxn.read(s, txroot, "ts4")
      val newOrd = ts4.select(explode(col("ts")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df"))
      // materialize BOTH replacement frames before any delete: they
      // derive from ts4 (untouched) but the pref rebuild reads newOrd,
      // and a lazy newOrd would re-read a half-rewritten tokord
      val cp = org.apache.spark.sql.graftx.Bridge
        .localCheckpointHonestStats _
      val ordP = cp(newOrd)
      val prefP = cp(frozenPrefixRows(ts4, ordP))
      SnapTxn.rewritePinned(s, txroot, Seq("tokord", "pref"),
        "maintain:refreeze:tokord") { (t, root) =>
        // full-content replace as delete-all + append: the
        // intermediate (empty) version is an unpinned slot in the
        // per-table chain — invisible to tx readers, vacuumable,
        // exactly like a torn absorb
        SnapTable.deleteWhere(s, root, lit(true))
        SnapTable.append(s, root,
          if (t == "tokord") ordP else prefP)
      }
    }
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
        // bootstrap token order from the full corpus — the same
        // frozen-geometry source semdedupGeometry uses for centroids
        LiveFunnel.setup(s, txroot, landingDf.limit(0), route, docs)
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
        // three id-tertile waves in deliberately NON-monotone order
        // (mid, then low, then high) through one checkpoint — commit
        // k IS micro-batch k (the stream_cdc_index transport), and
        // the out-of-order low wave forces real keeper demotions on
        // this dup-heavy corpus
        val maxId = docs.agg(max("doc_id")).first().getLong(0)
        val (c1, c2) = ((maxId + 1) / 3, 2 * (maxId + 1) / 3)
        SnapTable.create(s, landing,
          landingDf.filter(col("doc_id") >= c1 &&
            col("doc_id") < c2), "doc_id")
        drain()
        SnapTable.append(s, landing,
          landingDf.filter(col("doc_id") < c1))
        drain()
        SnapTable.append(s, landing,
          landingDf.filter(col("doc_id") >= c2))
        drain()
        LiveFunnel.serve(s, txroot).orderBy("doc_id")
      },
      // the BATCH ledger oracle, verbatim: the collapsed live
      // changelog must equal the from-scratch funnel decision —
      // transport, incrementality AND arrival order must not change
      // the result
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
        // r15 (guide §2.6): the lex and sem match computations are
        // independent — materialize them CONCURRENTLY as honest-stats
        // checkpoints (each feeds both waves' edge filters; the former
        // lazy persists were first populated inside ccMinLabel's w0
        // edge job, serially and with two branches racing the caches)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
        val fLex = pool.submit(
          new java.util.concurrent.Callable[DataFrame] {
            override def call(): DataFrame =
              org.apache.spark.sql.graftx.Bridge
                .localCheckpointHonestStats(Wave64Ops.lexPairs(s, dir))
          })
        val (route, gridded, _) = Wave62Ops.semdedupGeometry(s, dir)
        val f = route(gridded).persist()
        val sem = org.apache.spark.sql.graftx.Bridge
          .localCheckpointHonestStats(Wave64Ops.semPairs(f))
        val lex =
          try fLex.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          } finally pool.shutdown()
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
        def serveAt(tx: Int, pin: String): DataFrame =
          // latest wave per id via max_by (one row per id per wave, so
          // identical to the former window collapse — guide §2.3)
          SnapTxn.readAt(s, txroot, "labels", tx)
            .groupBy(col("id"))
            .agg(max_by(col("comp"), col("wave")).as("comp"))
            .select(lit(pin).as("pin"), col("id").as("doc_id"),
              col("comp"),
              when(col("id") === col("comp"), 1L).otherwise(0L)
                .as("is_survivor"))
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
        // lex/sem are checkpoint-backed now (blocks are ContextCleaner-
        // reclaimed once unreachable); only f keeps an explicit persist
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
