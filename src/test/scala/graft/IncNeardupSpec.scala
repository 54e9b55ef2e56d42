package graft

import graft.ops.IncNeardup
import graft.text.TextAlgs
import org.scalatest.funsuite.AnyFunSuite

/** Pins the incremental near-dup index (IncNeardup / the
  * `data_incremental_neardup` op): planted near-dups across the commit
  * boundary are found, unrelated documents are not, and batch 2's work is
  * O(batch + matching buckets) — the index absorbs exactly
  * LshBands x |batch| bucket rows per commit and the candidate probe
  * touches the bucket table, never the batch-1 text.
  */
class IncNeardupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // batch 1 (the indexed corpus)
  private val baseText = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val otherText = (100 to 140).map(i => s"w$i").mkString(" ")
  private val b1 = Seq(
    (1L, "en", baseText),
    (2L, "en", otherText),
    (3L, "de", (200 to 240).map(i => s"d$i").mkString(" ")))

  // batch 2 (the delta): 11 = batch-1 doc 1 with ONE token swapped
  // (Jaccard 39/41 ≈ 0.95), 12 = disjoint vocabulary, 13 = exact copy
  private val nearText =
    ((1 to 39).map(i => s"tok$i") :+ "novel").mkString(" ")
  private val b2 = Seq(
    (11L, "en", nearText),
    (12L, "en", (300 to 340).map(i => s"x$i").mkString(" ")),
    (13L, "de", (200 to 240).map(i => s"d$i").mkString(" ")))

  private def df(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "lang", "text")

  test("planted cross-commit near-dups verify; unrelated docs do not") {
    val f1 = IncNeardup.featurize(df(b1))
    val buckets = IncNeardup.bucketRows(f1)
    val fd = IncNeardup.featurize(df(b2))
    val hits = IncNeardup.verify(
      IncNeardup.candidates(fd, buckets),
      fd, f1.select($"doc_id", $"tokset"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits === Set((11L, 1L), (13L, 3L)))
  }

  test("verified pairs carry the exact rounded Jaccard") {
    val f1 = IncNeardup.featurize(df(b1))
    val fd = IncNeardup.featurize(df(b2))
    val jac = IncNeardup.verify(
        IncNeardup.candidates(fd, IncNeardup.bucketRows(f1)),
        fd, f1.select($"doc_id", $"tokset"))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(jac(13L) === 1.0)                     // exact copy
    assert(math.abs(jac(11L) - 39.0 / 41.0) < 1e-5)
  }

  test("absorb arithmetic: the index grows by LshBands x |batch| rows") {
    val f1 = IncNeardup.featurize(df(b1))
    assert(IncNeardup.bucketRows(f1).count() ===
      TextAlgs.LshBands.toLong * b1.size)
    val fd = IncNeardup.featurize(df(b2))
    assert(IncNeardup.bucketRows(fd).count() ===
      TextAlgs.LshBands.toLong * b2.size)
    // per-commit featurize work is the batch, not the corpus
    assert(fd.count() === b2.size.toLong)
  }

  test("candidate probe is bucket-local: disjoint-vocab doc yields none") {
    val f1 = IncNeardup.featurize(df(b1))
    val onlyDisjoint = IncNeardup.featurize(df(b2.filter(_._1 == 12L)))
    assert(IncNeardup.candidates(
      onlyDisjoint, IncNeardup.bucketRows(f1)).count() === 0L)
  }

  /** The op's storage flow in miniature: corpus + buckets + toksets as
    * SnapTables under one tx root, pinned together. */
  private def buildTx(): String = {
    import graft.sources.{SnapTable, SnapTxn}
    val txroot = Tmp.dir("incneardup_tx_spec")
    SnapTable.create(spark, s"$txroot/corpus", df(b1), "doc_id")
    val f1 = IncNeardup.featurize(
      SnapTable.readVersion(spark, s"$txroot/corpus", 1))
    SnapTable.create(spark, s"$txroot/buckets",
      IncNeardup.bucketRows(f1), "doc_id")
    SnapTable.create(spark, s"$txroot/toksets",
      f1.select($"doc_id", $"tokset"), "doc_id")
    SnapTxn.init(txroot, Seq("corpus", "buckets", "toksets"))
    txroot
  }

  test("absorb pins index version == corpus version in ONE tx record") {
    import graft.sources.SnapTxn
    val txroot = buildTx()
    val fd = IncNeardup.featurize(df(b2))
    SnapTxn.commit(spark, txroot, Seq(
      "corpus" -> df(b2),
      "buckets" -> IncNeardup.bucketRows(fd),
      "toksets" -> fd.select($"doc_id", $"tokset")), note = "absorb")
    val head = SnapTxn.head(txroot)
    // every absorb publishes exactly one record moving all three pins
    // in lockstep — the index can never claim to reflect a corpus
    // version it wasn't committed with
    assert(head.pins("corpus") === head.pins("buckets"))
    assert(head.pins("corpus") === head.pins("toksets"))
    assert(SnapTxn.read(spark, txroot, "buckets").count() ===
      graft.text.TextAlgs.LshBands.toLong * (b1.size + b2.size))
    assert(SnapTxn.read(spark, txroot, "corpus").count() ===
      (b1.size + b2.size).toLong)
  }

  test("torn absorb: a crash between index appends is invisible") {
    import graft.sources.{SnapTable, SnapTxn}
    val txroot = buildTx()
    val before = SnapTxn.head(txroot)
    val fd = IncNeardup.featurize(df(b2))
    // simulate the crash window the raw-parquet layout could not
    // survive: the buckets append is PREPARED (data + manifest written)
    // but the tx record is never published — the toksets append never
    // happened at all
    SnapTable.prepareAppend(spark, s"$txroot/buckets",
      IncNeardup.bucketRows(fd), before.pins("buckets"))
    // readers resolve through the tx pins: both index tables still show
    // the PRIOR consistent version — no torn state is observable
    assert(SnapTxn.head(txroot) === before)
    assert(SnapTxn.read(spark, txroot, "buckets").count() ===
      graft.text.TextAlgs.LshBands.toLong * b1.size)
    assert(SnapTxn.read(spark, txroot, "toksets").count() === b1.size.toLong)
    // the orphaned prepared snapshot is garbage, not corruption
    assert(SnapTxn.vacuumOrphans(txroot) === 1)
    // and a clean re-run of the full absorb still lands atomically
    SnapTxn.commit(spark, txroot, Seq(
      "corpus" -> df(b2),
      "buckets" -> IncNeardup.bucketRows(fd),
      "toksets" -> fd.select($"doc_id", $"tokset")), note = "absorb")
    val head = SnapTxn.head(txroot)
    assert(head.pins("corpus") === head.pins("buckets"))
    assert(SnapTxn.read(spark, txroot, "toksets").count() ===
      (b1.size + b2.size).toLong)
  }
}
