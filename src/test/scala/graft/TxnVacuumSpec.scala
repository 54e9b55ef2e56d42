package graft

import java.nio.file.{Files, Paths}

import graft.ops.Wave62Ops.StreamIndex
import graft.sources.{SnapTable, SnapTxn}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `SnapTxn.vacuumHistory` — the LEGAL erasure endpoint
  * (table_txn_vacuum): the pre-erasure transaction chain is physically
  * dropped (tx records AND per-table manifests AND the subject's data
  * files), time travel to it fails, the pinned head reads
  * byte-identically, and a retained no-op rewrite's filesRef referent
  * manifest survives (the depth-1 closure rule vacuumScope uses).
  */
class TxnVacuumSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val baseText = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val docs = Seq(
    (1L, "en", baseText),
    (3L, "en", baseText), // erasure subject
    (4L, "de", (200 to 240).map(i => s"d$i").mkString(" ")))

  private def freshIndex(): String = {
    val txroot = Tmp.dir("txnvacuum_spec")
    val df = docs.toDF("doc_id", "lang", "text")
    StreamIndex.setup(spark, txroot, df)
    // two batches so the cross-commit probe plants the (3, 1) match
    StreamIndex.ingest(spark, txroot, df.filter($"doc_id" =!= 3L), 0L)
    StreamIndex.ingest(spark, txroot, df.filter($"doc_id" === 3L), 1L)
    txroot
  }

  private def erase(txroot: String, subject: Long): Int =
    SnapTxn.rewritePinned(spark, txroot,
      Seq("corpus", "buckets", "toksets", "matches"),
      note = s"erase:$subject") { (t, root) =>
      if (t == "matches")
        SnapTable.deleteWhere(spark, root,
          col("new_id") === subject || col("old_id") === subject)
      else SnapTable.deleteWhere(spark, root, col("doc_id") === subject)
    }

  test("the pre-erasure chain is physically dropped: tx records and " +
      "manifests gone, time travel fails, subject data files " +
      "reclaimed, head byte-identical") {
    val txroot = freshIndex()
    val preErase = SnapTxn.latestTx(txroot) // absorb tx
    // the subject's bytes live in the absorb version's data files
    val corpusRoot = s"$txroot/corpus"
    val preFiles = SnapTable
      .load(corpusRoot, SnapTxn.head(txroot).pins("corpus")).files
      .map(f => Paths.get(corpusRoot, f.path))
    assert(preFiles.nonEmpty && preFiles.forall(Files.exists(_)))
    val eraseTx = erase(txroot, 3L)
    val headBefore = SnapTxn.read(spark, txroot, "corpus")
      .collect().map(_.toSeq).toSet
    assert(SnapTxn.vacuumHistory(txroot, eraseTx) === preErase)
    // tx-level time travel to ANY pre-erasure transaction now fails
    (1 to preErase).foreach { v =>
      intercept[Exception] {
        SnapTxn.readAt(spark, txroot, "corpus", v).collect()
      }
    }
    // the erase rewrote the corpus file(s) containing the subject, so
    // the pre-erase data files are unreferenced — and now GONE
    assert(preFiles.exists(p => !Files.exists(p)),
      "no pre-erasure corpus data file was reclaimed")
    // the head reads byte-identically through the retained pin
    assert(SnapTxn.read(spark, txroot, "corpus")
      .collect().map(_.toSeq).toSet === headBefore)
    assert(!headBefore.exists(_.head == 3L))
    // idempotent: nothing below keepFrom remains
    assert(SnapTxn.vacuumHistory(txroot, eraseTx) === 0)
  }

  test("a retained filesRef manifest keeps its depth-1 referent: " +
      "erasing a subject ABSENT from a table leaves that table's " +
      "no-op rewrite readable after the vacuum") {
    val txroot = freshIndex()
    // doc 4 has no matches (disjoint vocab): the matches rewrite is a
    // no-op that commits by reference to its parent manifest
    val eraseTx = erase(txroot, 4L)
    SnapTxn.vacuumHistory(txroot, eraseTx)
    // the matches table still reads through the retained pin (its
    // filesRef parent manifest must have survived the manifest sweep)
    val m = SnapTxn.read(spark, txroot, "matches").collect()
    assert(m.length === 1) // the (3, 1) near-dup pair is untouched
    assert(SnapTxn.read(spark, txroot, "corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L))
  }

  test("crash idempotence: a crash between the physical sweep and the " +
      "tx-record drop re-arms the vacuum — the re-run completes the " +
      "reclaim instead of returning 0") {
    val txroot = freshIndex()
    val preErase = SnapTxn.latestTx(txroot)
    val eraseTx = erase(txroot, 3L)
    // snapshot the doomed tx records, vacuum, then RESTORE them — the
    // exact on-disk state of a crash immediately before the final
    // record drop (the sweep completed, the records survived)
    val doomed = (1 to preErase).map { v =>
      val p = Paths.get(txroot, "_txlog", f"t$v%08d.json")
      p -> Files.readAllBytes(p)
    }
    assert(SnapTxn.vacuumHistory(txroot, eraseTx) === preErase)
    doomed.foreach { case (p, bytes) => Files.write(p, bytes) }
    // the re-run must complete the erasure, not report nothing to do
    assert(SnapTxn.vacuumHistory(txroot, eraseTx) === preErase)
    (1 to preErase).foreach { v =>
      intercept[Exception] {
        SnapTxn.readAt(spark, txroot, "corpus", v).collect()
      }
    }
    assert(!SnapTxn.read(spark, txroot, "corpus")
      .collect().exists(_.getLong(0) == 3L))
  }

  test("a tag pinning a pre-erasure version is refused loudly; after " +
      "dropTag the vacuum proceeds") {
    val txroot = freshIndex()
    // tag the PRE-erasure corpus head — the version the erase rewrites
    SnapTable.createTag(s"$txroot/corpus", "audit2026")
    val eraseTx = erase(txroot, 3L)
    val ex = intercept[IllegalArgumentException] {
      SnapTxn.vacuumHistory(txroot, eraseTx)
    }
    assert(ex.getMessage.contains("audit2026"))
    // the refusal is pre-sweep: nothing was reclaimed, history intact
    // (tx v3 is the batch-1 absorb — the subject doc 3 is visible there)
    assert(SnapTxn.readAt(spark, txroot, "corpus", 3).collect()
      .exists(_.getLong(0) == 3L))
    SnapTable.dropTag(s"$txroot/corpus", "audit2026")
    assert(SnapTxn.vacuumHistory(txroot, eraseTx) > 0)
    intercept[Exception] {
      SnapTxn.readAt(spark, txroot, "corpus", 3).collect()
    }
  }

  test("guards: an unknown keepFrom tx is refused; vacuuming at the " +
      "first tx is a no-op") {
    val txroot = freshIndex()
    intercept[IllegalArgumentException] {
      SnapTxn.vacuumHistory(txroot, 99)
    }
    assert(SnapTxn.vacuumHistory(txroot, 1) === 0)
    // everything still readable
    assert(SnapTxn.read(spark, txroot, "corpus").count() === 3L)
  }
}
