package graft

import graft.ops.Wave63Ops.Bm25Index
import graft.sources.{SnapTable, SnapTxn}
import org.scalatest.funsuite.AnyFunSuite

/** Pins ACID index maintenance (`table_txn_compact` /
  * SnapTxn.compactPinned): compaction rewrites the pinned snapshot into
  * fewer files with content identical, readers switch atomically at the
  * maintenance pin, the pre-compaction chain stays time-travelable, an
  * UNPINNED compact is invisible to tx readers, and the orphan-refusal
  * guard fires when the per-table head is not the pinned version.
  */
class TxnCompactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val b = (0 until 4).map { w =>
    (0 until 6).map(i =>
      (w * 100L + i, s"tok${i % 3} w$w common filler$i"))
  }

  private def freshIndex(): String = {
    val txroot = Tmp.dir("txncompact_spec")
    Bm25Index.setup(spark, txroot)
    b.zipWithIndex.foreach { case (rows, i) =>
      Bm25Index.ingest(spark, txroot,
        rows.toDF("doc_id", "text"), i.toLong)
    }
    txroot
  }

  private def pinnedFiles(txroot: String): Int =
    SnapTable.load(s"$txroot/postings",
      SnapTxn.head(txroot).pins("postings")).files.size

  test("compaction shrinks the file set, preserves content, and the " +
      "pre-compaction pin chain stays time-travelable") {
    val txroot = freshIndex()
    val beforeFiles = pinnedFiles(txroot)
    val beforeTx = SnapTxn.latestTx(txroot)
    val beforeRows = SnapTxn.read(spark, txroot, "postings")
      .orderBy("doc_id", "tok").collect().toSeq
    SnapTxn.compactPinned(spark, txroot, "postings", targetFiles = 2)
    assert(pinnedFiles(txroot) < beforeFiles)
    assert(pinnedFiles(txroot) <= 2)
    // content byte-identical through the new pin
    assert(SnapTxn.read(spark, txroot, "postings")
      .orderBy("doc_id", "tok").collect().toSeq === beforeRows)
    // the old pin set still reads the PRE-compaction layout
    assert(SnapTxn.readAt(spark, txroot, "postings", beforeTx)
      .count() === beforeRows.size.toLong)
    // other tables' pins did not move
    val h = SnapTxn.head(txroot)
    val prev = SnapTxn.load(txroot, beforeTx)
    assert(h.pins("docstats") === prev.pins("docstats"))
    assert(h.note === "maintain:compact:postings")
  }

  test("an UNPINNED compact (crash before the maintenance record) is " +
      "invisible to tx readers and vacuumable") {
    val txroot = freshIndex()
    val beforeTx = SnapTxn.latestTx(txroot)
    val beforeFiles = pinnedFiles(txroot)
    // the crash window: the rewrite landed, the pin never published
    SnapTable.compact(spark, s"$txroot/postings", targetFiles = 2)
    assert(SnapTxn.latestTx(txroot) === beforeTx)
    assert(pinnedFiles(txroot) === beforeFiles)
    // the orphaned rewrite is garbage, not corruption
    assert(SnapTxn.vacuumOrphans(txroot) === 1)
  }

  test("compactPinned refuses when the per-table head is an orphan") {
    val txroot = freshIndex()
    SnapTable.compact(spark, s"$txroot/postings", targetFiles = 2)
    val e = intercept[IllegalArgumentException] {
      SnapTxn.compactPinned(spark, txroot, "postings", targetFiles = 2)
    }
    assert(e.getMessage.contains("vacuumOrphans"))
    // after vacuum the maintenance lands
    SnapTxn.vacuumOrphans(txroot)
    SnapTxn.compactPinned(spark, txroot, "postings", targetFiles = 2)
    assert(pinnedFiles(txroot) <= 2)
  }
}
