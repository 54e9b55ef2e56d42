package graft

import graft.ops.Wave62Ops.StreamIndex
import graft.sources.{SnapTable, SnapTxn}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins atomic multi-table erasure (`table_txn_erase` /
  * SnapTxn.rewritePinned): the subject disappears from corpus AND
  * every index table in ONE pin move, the pre-erasure chain stays
  * time-travelable, and a crash between the per-table rewrites is
  * invisible (no state where the subject is gone from one table and
  * present in another).
  */
class TxnEraseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val baseText = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val docs = Seq(
    (1L, "en", baseText),
    (3L, "en", baseText), // the erasure subject; near-dups with 1
    (4L, "de", (200 to 240).map(i => s"d$i").mkString(" ")))

  private def freshIndex(): String = {
    val txroot = Tmp.dir("txnerase_spec")
    val df = docs.toDF("doc_id", "lang", "text")
    StreamIndex.setup(spark, txroot, df)
    StreamIndex.ingest(spark, txroot, df.filter($"doc_id" =!= 3L), 0L)
    StreamIndex.ingest(spark, txroot, df.filter($"doc_id" === 3L), 1L)
    txroot
  }

  private def idsIn(txroot: String, table: String,
      cols: Seq[String]): Set[Long] =
    cols.flatMap(c => SnapTxn.read(spark, txroot, table)
      .select(col(c)).collect().map(_.getLong(0))).toSet

  private def erase(txroot: String): Int =
    SnapTxn.rewritePinned(spark, txroot,
      Seq("corpus", "buckets", "toksets", "matches"),
      note = "erase:3") { (t, root) =>
      if (t == "matches")
        SnapTable.deleteWhere(spark, root,
          col("new_id") === 3L || col("old_id") === 3L)
      else SnapTable.deleteWhere(spark, root, col("doc_id") === 3L)
    }

  test("the subject disappears from all four tables in ONE pin move; " +
      "the pre-erasure chain stays time-travelable") {
    val txroot = freshIndex()
    // the subject is present everywhere before (doc 3 matched doc 1)
    assert(idsIn(txroot, "corpus", Seq("doc_id")).contains(3L))
    assert(idsIn(txroot, "buckets", Seq("doc_id")).contains(3L))
    assert(idsIn(txroot, "matches", Seq("new_id")).contains(3L))
    val beforeTx = SnapTxn.latestTx(txroot)
    val afterTx = erase(txroot)
    assert(afterTx === beforeTx + 1) // ONE record moved all four pins
    assert(!idsIn(txroot, "corpus", Seq("doc_id")).contains(3L))
    assert(!idsIn(txroot, "buckets", Seq("doc_id")).contains(3L))
    assert(!idsIn(txroot, "toksets", Seq("doc_id")).contains(3L))
    assert(!idsIn(txroot, "matches", Seq("new_id", "old_id"))
      .contains(3L))
    // unaffected rows survive
    assert(idsIn(txroot, "corpus", Seq("doc_id")) === Set(1L, 4L))
    // the ACID erasure point is the pin; the legal one is vacuum —
    // time travel still shows the subject pre-erasure
    assert(SnapTxn.readAt(spark, txroot, "corpus", beforeTx)
      .filter($"doc_id" === 3L).count() === 1L)
    assert(SnapTxn.head(txroot).note === "erase:3")
  }

  test("maintenance records do not clobber the absorb replay ledger: " +
      "a replayed batch after an erase is still a no-op") {
    val txroot = freshIndex()
    // pipeline down; operator runs maintenance ON TOP of the last absorb
    erase(txroot)
    assert(SnapTxn.head(txroot).note === "erase:3")
    // restart re-delivers the last micro-batch (id 1): the ledger must
    // still see its published absorb THROUGH the maintenance record —
    // a head-note-only check would re-absorb it (duplicate index rows)
    val df = docs.toDF("doc_id", "lang", "text")
    assert(StreamIndex.ingest(spark, txroot,
      df.filter($"doc_id" === 3L), 1L) === -1L)
    // and a genuinely NEW batch still lands
    val b2 = Seq((7L, "en", (300 to 340).map(i => s"x$i").mkString(" ")))
    assert(StreamIndex.ingest(spark, txroot,
      b2.toDF("doc_id", "lang", "text"), 2L) >= 0L)
  }

  test("a crash between the per-table rewrites is invisible: no state " +
      "where the subject is gone from one table but not another") {
    val txroot = freshIndex()
    val before = SnapTxn.head(txroot)
    // the crash window: corpus rewritten, nothing published
    SnapTable.deleteWhere(spark, s"$txroot/corpus", col("doc_id") === 3L)
    assert(SnapTxn.head(txroot) === before)
    // through the pins the subject is still present EVERYWHERE
    assert(idsIn(txroot, "corpus", Seq("doc_id")).contains(3L))
    assert(idsIn(txroot, "buckets", Seq("doc_id")).contains(3L))
    // the orphaned rewrite is garbage; a clean re-run lands atomically
    assert(SnapTxn.vacuumOrphans(txroot) === 1)
    erase(txroot)
    assert(!idsIn(txroot, "corpus", Seq("doc_id")).contains(3L))
    assert(!idsIn(txroot, "matches", Seq("new_id", "old_id"))
      .contains(3L))
  }
}
