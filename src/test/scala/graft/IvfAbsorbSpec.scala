package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the incremental-IVF ABSORB cadence (VERDICT-r11 #2) on a planted
  * fixture: `vec_incremental_semdedup` runs batch 1 (build) → batch 2
  * (probe, then absorb) → batch 3 (probe the union), and batch 3 must
  * find a near-dup of a BATCH-2 vector — a direction that exists nowhere
  * in batch 1, so the hit is only reachable through the absorbed index.
  * Also pins the absorb mechanics: the index directory after the run is
  * the build's partitioned layout PLUS one appended writer generation
  * (two distinct writer UUIDs in the shared partition), never a rebuild,
  * and holds exactly |b1| + |b2| rows.
  */
class IvfAbsorbSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** 9 vectors (dense ids 0..8 — the footer density proof must hold),
    * dim-8 unit basis, chosen so every similarity is exactly 0 or 1:
    *  - batch 1 (ids 0,3,6): e1, e2, e3
    *  - batch 2 (ids 1,4,7): e1 (dup of id 0), e4 (NOVEL), e5
    *  - batch 3 (ids 2,5,8): e6, e2 (dup of id 3), e4 (dup of BATCH-2
    *    id 4 — the planted cross-absorb hit)
    */
  private def unit(i: Int): Seq[Float] =
    (0 until 8).map(j => if (j == i) 1.0f else 0.0f)

  private val fixture = Seq(
    (0L, unit(0)), (3L, unit(1)), (6L, unit(2)),
    (1L, unit(0)), (4L, unit(3)), (7L, unit(4)),
    (2L, unit(5)), (5L, unit(1)), (8L, unit(3)))

  private def writeFixture(): String = {
    val dir = Tmp.dir("ivf_absorb_fix")
    fixture.toDF("vec_id", "embedding")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("batch 3 finds the planted near-dup of a batch-2 vector") {
    val dir = writeFixture()
    val got = graft.ops.Wave56Ops.incSemdedupBody(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // k = cellSplit(ceil(9/3)) = 2 → centroids e1 (cid 0) and e2
    // (cid 3); every other basis direction ties to cell 0 (lowest cid).
    // batch 2: 3 new in cell 0, 1 dup (id 1 ≅ id 0).
    // batch 3: id 8 (e4) matches ONLY the absorbed batch-2 id 4 — no
    // batch-1 vector has any e4 component, so n_dup=1 in cell 0 proves
    // the probe read the absorbed index; id 5 (e2) matches batch-1
    // id 3 in cell 3.
    assert(got === Seq((2L, 0L, 3L, 1L), (3L, 0L, 2L, 1L),
      (3L, 3L, 1L, 1L)))
  }

  test("absorb is an atomic append pinned to the corpus version") {
    import graft.sources.SnapTxn
    val dir = writeFixture()
    val txroot = Tmp.dir("ivf_absorb_tx")
    graft.ops.Wave56Ops
      .incSemdedupBody(spark, dir, txrootOverride = Some(txroot))
      .collect()
    // ONE tx record per absorb moves corpus and index pins in
    // lockstep — the index can never claim to reflect a corpus
    // version it wasn't committed with
    val head = SnapTxn.head(txroot)
    assert(head.pins("corpus") === head.pins("index"))
    // the index holds batch 1 AND batch 2 (never batch 3 — probes
    // don't self-absorb); tx v1 still serves the pre-absorb build
    val v1 = SnapTxn.readAt(spark, txroot, "index", 1)
    val v2 = SnapTxn.read(spark, txroot, "index")
    assert(v1.count() === 3L)
    assert(v2.count() === 6L)
    assert(v2.select("vec_id").collect().map(_.getLong(0)).sorted
      === Array(0L, 1L, 3L, 4L, 6L, 7L))
    // APPEND, not rebuild: every build-time data file survives into
    // the absorbed version's file set
    assert(v1.inputFiles.toSet.subsetOf(v2.inputFiles.toSet),
      "absorb must carry the build's files forward, not rewrite them")
    assert(v2.inputFiles.length > v1.inputFiles.length)
  }
}
