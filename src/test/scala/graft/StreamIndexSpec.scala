package graft

import graft.ops.{IncNeardup, Wave62Ops}
import graft.ops.Wave62Ops.StreamIndex
import graft.sources.SnapTxn
import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming-ACID ingest cadence (`stream_neardup_index` /
  * Wave62Ops.StreamIndex): per-batch matches equal the shared IncNeardup
  * library run at the same batch boundary, a replayed micro-batch id is
  * a published-note no-op (exactly-once absorb without sink state), all
  * four table pins move in lockstep per transaction, and durability
  * survives a "restart" — a fresh reader sees everything through the tx
  * pins with no stream state at all.
  */
class StreamIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // the IncNeardupSpec corpus: batch 2 plants one near-dup (11~1) and
  // one exact copy (13~3) against batch 1, plus a disjoint-vocab doc
  private val baseText = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val b1 = Seq(
    (1L, "en", baseText),
    (2L, "en", (100 to 140).map(i => s"w$i").mkString(" ")),
    (3L, "de", (200 to 240).map(i => s"d$i").mkString(" ")))
  private val b2 = Seq(
    (11L, "en", ((1 to 39).map(i => s"tok$i") :+ "novel").mkString(" ")),
    (12L, "en", (300 to 340).map(i => s"x$i").mkString(" ")),
    (13L, "de", (200 to 240).map(i => s"d$i").mkString(" ")))

  private def df(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "lang", "text")

  private def freshTx(): String = {
    val txroot = Tmp.dir("streamindex_spec")
    StreamIndex.setup(spark, txroot, df(b1))
    txroot
  }

  test("batch 0 probes the empty index and absorbs; batch 1 finds the " +
      "planted pairs — equal to the shared library at the same boundary") {
    val txroot = freshTx()
    assert(StreamIndex.ingest(spark, txroot, df(b1), 0L) === 0L)
    assert(StreamIndex.ingest(spark, txroot, df(b2), 1L) === 2L)
    val got = SnapTxn.read(spark, txroot, "matches")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the library result at the same batch boundary (the same pairs the
    // batch op's cadence finds)
    val f1 = IncNeardup.featurize(df(b1))
    val fd = IncNeardup.featurize(df(b2))
    val want = IncNeardup.verify(
        IncNeardup.candidates(fd, IncNeardup.bucketRows(f1)),
        fd, f1.select($"doc_id", $"tokset"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got === Set((11L, 1L), (13L, 3L)))
  }

  test("replayed micro-batch id is a no-op: the txn log is the " +
      "idempotency ledger") {
    val txroot = freshTx()
    StreamIndex.ingest(spark, txroot, df(b1), 0L)
    StreamIndex.ingest(spark, txroot, df(b2), 1L)
    val head = SnapTxn.latestTx(txroot)
    val corpusN = SnapTxn.read(spark, txroot, "corpus").count()
    // the crash-replay shape: foreachBatch re-delivers batch 1
    assert(StreamIndex.ingest(spark, txroot, df(b2), 1L) === -1L)
    assert(SnapTxn.latestTx(txroot) === head)
    assert(SnapTxn.read(spark, txroot, "corpus").count() === corpusN)
    assert(StreamIndex.absorbed(txroot, 1L))
    assert(!StreamIndex.absorbed(txroot, 2L))
  }

  test("all four pins move in lockstep; the index version IS the corpus " +
      "version at every transaction") {
    val txroot = freshTx()
    StreamIndex.ingest(spark, txroot, df(b1), 0L)
    StreamIndex.ingest(spark, txroot, df(b2), 1L)
    SnapTxn.txVersions(txroot).foreach { v =>
      val pins = SnapTxn.load(txroot, v).pins
      assert(pins.values.toSet.size === 1,
        s"tx v$v pins moved out of lockstep: $pins")
    }
    // init + two absorbs
    assert(SnapTxn.latestTx(txroot) === 3)
  }

  test("restart durability: a fresh reader resolves everything through " +
      "the pins — no stream state involved") {
    val txroot = freshTx()
    StreamIndex.ingest(spark, txroot, df(b1), 0L)
    StreamIndex.ingest(spark, txroot, df(b2), 1L)
    // "restart": nothing carried over but the txroot path
    assert(SnapTxn.read(spark, txroot, "corpus").count() === 6L)
    assert(SnapTxn.read(spark, txroot, "buckets").count() ===
      graft.text.TextAlgs.LshBands.toLong * 6)
    assert(SnapTxn.read(spark, txroot, "toksets").count() === 6L)
    assert(SnapTxn.read(spark, txroot, "matches").count() === 2L)
    // and the NEXT batch probes the union of both absorbed waves: a
    // copy of a batch-2 doc must match it
    val b3 = Seq((21L, "en",
      ((1 to 39).map(i => s"tok$i") :+ "novel").mkString(" ")))
    assert(StreamIndex.ingest(spark, txroot, df(b3), 2L) === 2L)
    val m3 = SnapTxn.read(spark, txroot, "matches")
      .filter($"new_id" === 21L)
      .collect().map(_.getLong(1)).toSet
    assert(m3 === Set(1L, 11L))
  }

  test("the live op runs end-to-end on the fixture and aggregates per " +
      "lang") {
    val out = Wave62Ops.queries.head.fn(spark, TestSpark.Sf)
      .collect()
    assert(out.nonEmpty)
    val total = out.map(_.getLong(1)).sum
    // two quarter-waves of the sf0.001 documents table
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .filter($"doc_id" % 4 <= 1).count()
    assert(total === docs)
  }
}
