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
}
