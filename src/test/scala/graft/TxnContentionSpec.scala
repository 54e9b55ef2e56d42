package graft

import graft.ops.Wave62Ops.StreamIndex
import graft.sources.{SnapTable, SnapTxn}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LIVE maintenance-vs-absorb contention at the SnapTxn layer
  * (VERDICT-r12 #2): a compact/erase committing WHILE a streaming
  * absorb is in flight on the SAME txroot, driven deterministically
  * through the package-private publish/prepare seam. Both
  * serialization orders must be correct:
  *
  *  - maintenance publishes first → the in-flight absorb's publish
  *    ABORTS (its prepared snapshots were built against the pre-
  *    maintenance pins); the stream's replay then re-ingests the batch
  *    against the new head exactly once — no double absorb, no
  *    resurrection of erased rows.
  *  - the absorb publishes first → the maintenance aborts (either at
  *    its publish, or earlier at the immediately-before-each-rewrite
  *    head==pin re-check added this round); a clean re-run applies the
  *    maintenance on top of the absorbed state.
  */
class TxnContentionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val baseText = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val b0 = Seq(
    (1L, "en", baseText),
    (3L, "en", baseText), // erase subject; near-dups with 1
    (4L, "de", (200 to 240).map(i => s"d$i").mkString(" ")))
  // batch 1 carries a fresh near-dup of 1 — if a lost-race absorb were
  // double-applied, (21, 1) would appear twice in matches
  private val b1 = Seq(
    (21L, "en", ((1 to 39).map(i => s"tok$i") :+ "new21").mkString(" ")),
    (22L, "en", (300 to 340).map(i => s"y$i").mkString(" ")))

  private def df(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "lang", "text")

  private def freshTx(): String = {
    val txroot = Tmp.dir("txncontention_spec")
    StreamIndex.setup(spark, txroot, df(b0))
    assert(StreamIndex.ingest(spark, txroot, df(b0), 0L) === 0L)
    txroot
  }

  private val eraseTables = Seq("corpus", "buckets", "toksets", "matches")

  private def erase(txroot: String): Int =
    SnapTxn.rewritePinned(spark, txroot, eraseTables,
      note = "erase:3") { (t, root) =>
      if (t == "matches")
        SnapTable.deleteWhere(spark, root,
          col("new_id") === 3L || col("old_id") === 3L)
      else SnapTable.deleteWhere(spark, root, col("doc_id") === 3L)
    }

  test("maintenance publishes first: the in-flight absorb aborts, the " +
      "replay re-ingests once against the new head, erased rows stay " +
      "erased") {
    val txroot = freshTx()
    // the in-flight absorb read its base (and probed the pinned index)
    // BEFORE the erase; its prepare+publish run after — the lost-race
    // interleaving a foreachBatch absorb actually hits
    val base = SnapTxn.head(txroot)
    val fd = graft.ops.IncNeardup.featurize(df(b1))
    erase(txroot)
    assert(SnapTxn.head(txroot).note === "erase:3")
    val prepared = Map(
      "corpus" -> SnapTable.prepareAppend(spark, s"$txroot/corpus",
        df(b1), base.pins("corpus")),
      "buckets" -> SnapTable.prepareAppend(spark, s"$txroot/buckets",
        graft.ops.IncNeardup.bucketRows(fd), base.pins("buckets")),
      "toksets" -> SnapTable.prepareAppend(spark, s"$txroot/toksets",
        fd.select($"doc_id", $"tokset"), base.pins("toksets")))
    // the absorb's publish must abort — its parents are the moved pins
    intercept[SnapTable.ConcurrentCommitException] {
      SnapTxn.publish(txroot, base, prepared, SnapTxn.batchNote(1L))
    }
    // nothing published: the ledger still shows batch 1 unabsorbed,
    // so the stream restart replays it (the orphaned prepares are
    // invisible garbage)
    assert(!SnapTxn.batchAbsorbed(txroot, 1L))
    assert(StreamIndex.ingest(spark, txroot, df(b1), 1L) === 1L)
    // exactly-once: the replay landed once, on top of the erase
    val corpus = SnapTxn.read(spark, txroot, "corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(corpus === Seq(1L, 4L, 21L, 22L)) // 3 erased, b1 once
    val matches = SnapTxn.read(spark, txroot, "matches")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(matches === Seq((21L, 1L))) // once, not twice; no (*,3)
    // and a second replay of the same id is the published-note no-op
    assert(StreamIndex.ingest(spark, txroot, df(b1), 1L) === -1L)
  }

  test("absorb publishes first: the maintenance aborts at publish and " +
      "a clean re-run erases the absorbed state too") {
    val txroot = freshTx()
    var injected = false
    // single-table maintenance with the absorb injected AFTER the
    // rewrite verb ran (so the per-table re-check passed): the abort
    // must come from publish's first-committer-wins pin comparison
    val ex = intercept[SnapTable.ConcurrentCommitException] {
      SnapTxn.rewritePinned(spark, txroot, Seq("corpus"),
        note = "erase:3") { (_, root) =>
        val v = SnapTable.deleteWhere(spark, root, col("doc_id") === 3L)
        if (!injected) {
          injected = true
          assert(StreamIndex.ingest(spark, txroot, df(b1), 1L) === 2L)
        }
        v
      }
    }
    assert(ex.getMessage.contains("first committer wins"))
    // the absorb won: its rows are visible, the subject is NOT erased
    assert(SnapTxn.head(txroot).note === SnapTxn.batchNote(1L))
    assert(SnapTxn.read(spark, txroot, "corpus")
      .filter($"doc_id" === 3L).count() === 1L)
    // the aborted rewrite left an unpinned orphan below the absorb's
    // version — reclaim it, then the re-run lands on the new head
    SnapTxn.vacuumOrphans(txroot)
    erase(txroot)
    val corpus = SnapTxn.read(spark, txroot, "corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(corpus === Seq(1L, 4L, 21L, 22L))
    assert(SnapTxn.read(spark, txroot, "matches")
      .filter($"new_id" === 3L || $"old_id" === 3L).count() === 0L)
  }

  test("absorb between two tables' rewrites: the NEXT table's " +
      "immediately-before-rewrite re-check aborts the maintenance " +
      "before it can fold uncommitted state in") {
    val txroot = freshTx()
    var injected = false
    val ex = intercept[IllegalArgumentException] {
      SnapTxn.rewritePinned(spark, txroot, eraseTables,
        note = "erase:3") { (t, root) =>
        val v = SnapTable.deleteWhere(spark, root,
          if (t == "matches")
            col("new_id") === 3L || col("old_id") === 3L
          else col("doc_id") === 3L)
        if (!injected) {
          injected = true // absorb lands after table 1, before table 2
          assert(StreamIndex.ingest(spark, txroot, df(b1), 1L) === 2L)
        }
        v
      }
    }
    assert(ex.getMessage.contains("not the pinned version"))
    // the absorb is the head; no erase state was pinned anywhere
    assert(SnapTxn.head(txroot).note === SnapTxn.batchNote(1L))
    assert(SnapTxn.read(spark, txroot, "corpus")
      .filter($"doc_id" === 3L).count() === 1L)
    assert(SnapTxn.read(spark, txroot, "buckets")
      .filter($"doc_id" === 3L).count() > 0L)
  }

  test("ledger identity guard: a batch id BELOW the last absorbed one " +
      "is refused loudly (reattached fresh checkpoint), never " +
      "re-absorbed") {
    val txroot = freshTx()
    assert(StreamIndex.ingest(spark, txroot, df(b1), 1L) === 2L)
    assert(SnapTxn.batchAbsorbed(txroot, 1L)) // replay of the last: skip
    assert(!SnapTxn.batchAbsorbed(txroot, 2L)) // next: absorb
    val ex = intercept[IllegalStateException] {
      SnapTxn.batchAbsorbed(txroot, 0L) // restarted id ladder
    }
    assert(ex.getMessage.contains("fresh checkpoint"))
  }
}
