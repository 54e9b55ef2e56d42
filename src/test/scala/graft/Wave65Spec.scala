package graft

import graft.ops.Wave65Ops.LiveFunnel
import graft.ops.Wave62Ops
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the LIVE curation funnel (pipe_curation_live) on a
  * purpose-built fixture, driven with OUT-OF-ORDER waves that force
  * every decision-flip path the real fixture may never exercise:
  *
  *  - wave 1 lands doc 15 — an exact dup of doc 20's token set with a
  *    SMALLER id — which DEMOTES the wave-0 keeper: doc 20 flips
  *    survived → exact_dup(15), doc 41's kept_by moves 20 → 15, and
  *    the group's stage-4/5 representative swaps from 20 to 15;
  *  - the swap REMOVES doc 20 from the stage-5 graph, where wave 0
  *    had semdedup'd doc 30 into it (same IVF cell, cos ≈ 1), so doc
  *    30 flips BACK from sem_dup(20) to survived — the
  *    delta-CC-with-deletions path;
  *  - wave 2's doc 50 bridges the stage-4 components of group 10 and
  *    group 20 (J(50,·) = 40/48 >= 0.8 while J(10, 20's set) = 32/48
  *    < 0.8), so doc 15 — the group's CURRENT keeper and a rep —
  *    flips survived → near_dup(10);
  *  - docs 11/12 pin the row-local gates (lang mismatch / low
  *    quality).
  *
  * Also pinned: idempotent replay (same batch id → no-op), the
  * land-once guard, changelog row arithmetic (every flipped doc has
  * exactly two ledger rows), and the headline equality — the
  * collapsed live ledger EQUALS the batch pipe_curation_ledger on the
  * same fixture dir despite the scrambled arrival order (the equality
  * the driver's shared oracle replays at the graded SFs).
  */
class Wave65Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // token sets: A (32 toks incl. the 4 en stopwords), B, C (8 each);
  // F and G are 40-token sets sharing 36 (J = 36/44 ≈ 0.818 >= 0.8)
  // for the block-move scenario
  private val A = Seq("the", "and", "of", "to") ++
    (0 until 28).map(i => f"a$i%02d")
  private val B = (0 until 8).map(i => f"b$i%02d")
  private val C = (0 until 8).map(i => f"c$i%02d")
  private val F = Seq("the", "and", "of", "to") ++
    (0 until 36).map(i => f"f$i%02d")
  private val G = Seq("the", "and", "of", "to") ++
    (0 until 32).map(i => f"f$i%02d") ++
    (0 until 4).map(i => f"g$i%02d")

  private lazy val dir: String = {
    val d = Tmp.dir("wave65_fixture")
    val docs = Seq(
      (10L, "en", "src0", (A ++ B).mkString(" ")),
      (11L, "en", "src0",
        "der die das und ist ein mit für nicht immer wieder gern"),
      (12L, "en", "src0", Seq.fill(40)("zz").mkString(" ")),
      // exact dup of 20's SET, different order — the late demoter
      (15L, "en", "src0", (C ++ A).mkString(" ")),
      // the block-move trio: 16 (F, src1) near-dups 18 (G, src1) in
      // block src1; late 14 (F's set, src9!) demotes 16 AND moves the
      // F group into block src9 — the filtered edge disappears
      (14L, "en", "src9", F.reverse.mkString(" ")),
      (16L, "en", "src1", F.mkString(" ")),
      (18L, "en", "src1", G.mkString(" ")),
      (20L, "en", "src0", (A ++ C).mkString(" ")),
      (30L, "en", "src0",
        (Seq("the", "and", "of", "to") ++
          (0 until 36).map(i => f"e$i%02d")).mkString(" ")),
      (40L, "en", "src0", (0 until 40).map(i => f"d$i%02d")
        .mkString(" ")),
      // exact dup of 20: shuffled order plus a repeated token
      (41L, "en", "src0",
        ((A ++ C).reverse ++ Seq("c00")).mkString(" ")),
      (50L, "en", "src0", (A ++ B ++ C).mkString(" ")),
      // fresh vocabulary NEVER seen by the frozen-token-order
      // bootstrap (ids <= 41): the unseen-token fallback order must
      // still find this near-dup pair (J = 36/44)
      (52L, "en", "src0", (0 until 40).map(i => f"h$i%02d")
        .mkString(" ")),
      (53L, "en", "src0", ((0 until 36).map(i => f"h$i%02d") ++
        (0 until 4).map(i => f"i$i%02d")).mkString(" ")))
      .toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    // ids 0-2 are the frozen coarse centroids (vec_id < k = ceil(√6));
    // 20 and 30 share cell 1 at cos ≈ 1; 10 sits alone in cell 0;
    // 15 deliberately has NO vector (the rep swap removes 20's vector
    // from the stage-5 graph without replacing it)
    val emb = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f)),
      (1L, Array(0f, 1.0f, 0f, 0f)),
      (2L, Array(0f, 0f, 1.0f, 0f)),
      (10L, Array(0.9f, 0.05f, 0f, 0f)),
      (20L, Array(0f, 0.95f, 0.1f, 0f)),
      (30L, Array(0f, 0.93f, 0.12f, 0f)))
      .toDF("vec_id", "embedding")
    emb.write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def landing(): (DataFrame, DataFrame => DataFrame) = {
    val (route, gridded, _) = Wave62Ops.semdedupGeometry(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    (docs.join(gridded.withColumnRenamed("vec_id", "doc_id"),
      Seq("doc_id"), "left"), route)
  }

  private def decisions(df: DataFrame): Map[Long, (Long, String, Option[Long])] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap

  test("live funnel, out-of-order waves: a late smaller exact-dup " +
      "demotes the keeper (kept_by cascades), the rep swap flips the " +
      "semdedup victim back to survived, a later bridge flips the new " +
      "keeper to near_dup; replay no-op; land-once guard; collapsed " +
      "ledger equals the batch ledger") {
    val (land, route) = landing()
    val txroot = Tmp.dir("wave65_tx")
    // frozen token order bootstrapped from ids <= 41 only — wave 2's
    // h-vocabulary is UNSEEN and exercises the fallback order
    LiveFunnel.setup(spark, txroot, land.limit(0), route,
      land.filter($"doc_id" <= 41L))

    // wave 0: the MIDDLE ids — 10, 14, 15 deliberately NOT landed yet
    val n0 = LiveFunnel.ingest(spark, txroot,
      land.filter($"doc_id" >= 16L && $"doc_id" <= 41L), 0L, route)
    assert(n0 === 6L)
    val d0 = decisions(LiveFunnel.serve(spark, txroot))
    assert(d0(16L) === ((0L, "survived", None)))
    assert(d0(18L) === ((4L, "near_dup", Some(16L))))
    assert(d0(20L) === ((0L, "survived", None)))
    assert(d0(30L) === ((5L, "sem_dup", Some(20L))))
    assert(d0(40L) === ((0L, "survived", None)))
    assert(d0(41L) === ((3L, "exact_dup", Some(20L))))

    // wave 1: LOWER ids arrive late — 15 demotes keeper 20; 14
    // demotes keeper 16 AND moves the F group's block src1 -> src9
    LiveFunnel.ingest(spark, txroot,
      land.filter($"doc_id" <= 15L), 1L, route)
    val d1 = decisions(LiveFunnel.serve(spark, txroot))
    assert(d1(20L) === ((3L, "exact_dup", Some(15L))),
      "doc 20 must flip survived -> exact_dup when 15 demotes it")
    assert(d1(41L) === ((3L, "exact_dup", Some(15L))),
      "doc 41's kept_by must cascade to the new keeper")
    assert(d1(30L) === ((0L, "survived", None)),
      "doc 30 must flip sem_dup -> survived when the rep swap " +
        "removes 20's vector from the stage-5 graph")
    assert(d1(16L) === ((3L, "exact_dup", Some(14L))))
    assert(d1(18L) === ((0L, "survived", None)),
      "doc 18 must flip near_dup -> survived when the block move " +
        "filters out its only stage-4 edge (component split)")
    assert(d1(14L) === ((0L, "survived", None)))
    assert(d1(15L) === ((0L, "survived", None)))
    assert(d1(10L) === ((0L, "survived", None)))
    assert(d1(11L) === ((1L, "lang_mismatch", None)))
    assert(d1(12L) === ((2L, "low_quality", None)))

    // wave 2: the HIGH id bridges groups 10 and 20 at stage 4
    LiveFunnel.ingest(spark, txroot,
      land.filter($"doc_id" >= 50L), 2L, route)
    val d2 = decisions(LiveFunnel.serve(spark, txroot))
    assert(d2(15L) === ((4L, "near_dup", Some(10L))),
      "the current keeper must flip survived -> near_dup on merge")
    assert(d2(50L) === ((4L, "near_dup", Some(10L))))
    assert(d2(52L) === ((0L, "survived", None)),
      "unseen-vocabulary docs must still prefix-match (fallback order)")
    assert(d2(53L) === ((4L, "near_dup", Some(52L))))
    assert(d2(10L) === ((0L, "survived", None)))
    assert(d2(20L) === ((3L, "exact_dup", Some(15L))))
    assert(d2(30L) === ((0L, "survived", None)))
    assert(d2(40L) === ((0L, "survived", None)))

    // changelog arithmetic: exactly the flipped docs were re-decided
    val rows = graft.sources.SnapTxn.read(spark, txroot, "ledger")
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(20L) === 2L && rows(30L) === 2L &&
      rows(41L) === 2L && rows(15L) === 2L &&
      rows(16L) === 2L && rows(18L) === 2L)
    assert(rows(10L) === 1L && rows(40L) === 1L &&
      rows(50L) === 1L && rows(14L) === 1L &&
      rows(52L) === 1L && rows(53L) === 1L)

    // idempotent replay: the same batch id is a no-op
    assert(LiveFunnel.ingest(spark, txroot,
      land.filter($"doc_id" >= 50L), 2L, route) === -1L)
    assert(decisions(LiveFunnel.serve(spark, txroot)) === d2)

    // a doc_id lands exactly once, loudly
    val ex = intercept[IllegalArgumentException] {
      LiveFunnel.ingest(spark, txroot,
        land.filter($"doc_id" === 12L), 3L, route)
    }
    assert(ex.getMessage.contains("re-lands"))

    // the headline equality: collapsed live ledger == batch ledger,
    // arrival order notwithstanding
    val live = LiveFunnel.serve(spark, txroot)
      .orderBy("doc_id").collect().map(_.toSeq)
    val batch = SparkEntry.queries("pipe_curation_ledger")(spark, dir)
      .collect().map(_.toSeq)
    assert(live.toSeq === batch.toSeq)
  }

  test("prefix hot-group fence: a collision group above the cap is " +
      "refused loudly BEFORE the candidate join launches; bounded " +
      "groups pass") {
    import graft.ops.Wave64Ops
    // 20001 identical token sets -> one (ptok) group above the cap
    // (the worst case df ordering cannot dissolve: identical sets
    // share even their rarest tokens)
    val skew = spark.range(Wave64Ops.PrefixGroupCap + 1)
      .selectExpr("id AS doc_id",
        "array('q1','q2','q3','q4','q5') AS ts")
    val ex = intercept[IllegalArgumentException] {
      Wave64Ops.prefixJaccardPairs(skew, Nil)
    }
    assert(ex.getMessage.contains("collision group"))
    // disjoint vocabularies never collide: fence silent, zero pairs
    val ok = spark.range(1000).selectExpr("id AS doc_id",
      "transform(sequence(0, 4), i -> concat('t', id, '_', i)) AS ts")
    assert(Wave64Ops.prefixJaccardPairs(ok, Nil).count() === 0L)
  }

  test("derandomized banded MinHash: every emitted pair is a true " +
      "near-dup (banded ⊆ complete prefix rule) with >= 0.9 recall " +
      "on the graded slice") {
    val sf = "/root/testdata/sf0.001"
    val banded = SparkEntry.queries("text_dedup_minhash_det")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val complete = graft.ops.Wave64Ops.prefixJaccardPairs(
      spark.read.parquet(s"$sf/documents.parquet")
        .filter($"lang" === "en" && $"source".isin("src0", "src1"))
        .select($"doc_id",
          array_sort(array_distinct(split($"text", " "))).as("ts")),
      Nil).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.nonEmpty)
    assert(banded.subsetOf(complete),
      "the exact verify must make every banded candidate a true pair")
    val recall = banded.size.toDouble / complete.size
    assert(recall >= 0.9,
      s"banded recall $recall below the 16x4 design point")
  }

  test("crossmodal serve: a held pin-1 survivor reader reproduces " +
      "pin 1 after the head moves; the head serve reflects the merge") {
    import graft.sources.{SnapTable, SnapTxn}
    import org.apache.spark.sql.expressions.Window
    val txroot = Tmp.dir("wave65_serve_tx")
    val w0 = Seq((0L, 2L, 2L), (0L, 4L, 2L)).toDF("wave", "id", "comp")
    SnapTable.createEmpty(s"$txroot/labels", w0.schema, "id")
    SnapTxn.init(txroot, Seq("labels"))
    SnapTxn.commit(spark, txroot, Seq("labels" -> w0),
      note = SnapTxn.batchNote(0L))
    def serveAt(tx: Int): DataFrame = {
      val wl = Window.partitionBy("id").orderBy(col("wave").desc)
      SnapTxn.readAt(spark, txroot, "labels", tx)
        .withColumn("rn", row_number().over(wl))
        .filter(col("rn") === 1)
        .select(col("id"), col("comp"),
          when(col("id") === col("comp"), 1L).otherwise(0L)
            .as("is_survivor"))
    }
    val p1 = serveAt(SnapTxn.latestTx(txroot)) // plan held across the move
    // wave 1 merges everything under new doc 0's component
    SnapTxn.commit(spark, txroot, Seq("labels" ->
      Seq((1L, 0L, 0L), (1L, 2L, 0L), (1L, 4L, 0L))
        .toDF("wave", "id", "comp")),
      note = SnapTxn.batchNote(1L))
    val held = p1.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(held === Set((2L, 2L, 1L), (4L, 2L, 0L)),
      "held pin-1 reader must reproduce pin 1 exactly")
    val head = serveAt(SnapTxn.latestTx(txroot)).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(head === Set((0L, 0L, 1L), (2L, 0L, 0L), (4L, 0L, 0L)))
  }
}
