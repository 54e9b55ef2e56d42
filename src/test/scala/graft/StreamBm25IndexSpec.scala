package graft

import graft.ops.Wave63Ops.Bm25Index
import graft.sources.SnapTxn
import org.scalatest.funsuite.AnyFunSuite

/** Pins the incremental lexical index (`stream_bm25_index` /
  * Wave63Ops.Bm25Index): serving from the pinned index equals the
  * from-scratch ranker once every wave is absorbed, df is additive
  * across disjoint batches, the cumulative stats chain is exact, a
  * replayed micro-batch id is a no-op, and all four pins move in
  * lockstep.
  */
class StreamBm25IndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTx(): String = {
    val txroot = Tmp.dir("bm25index_spec")
    Bm25Index.setup(spark, txroot)
    txroot
  }

  private val b1 = Seq(
    (1L, "hash join hash scan"),
    (2L, "stream window stream stream"))
  private val b2 = Seq(
    (3L, "hash merge sort"),
    (4L, "vector query filter filter"))

  private def df(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("df is additive across disjoint batches; the cumulative stats " +
      "chain is exact") {
    val txroot = freshTx()
    assert(Bm25Index.ingest(spark, txroot, df(b1), 0L) === 2L)
    assert(Bm25Index.ingest(spark, txroot, df(b2), 1L) === 2L)
    val dfm = SnapTxn.read(spark, txroot, "dfdelta")
      .groupBy("tok").sum("df")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'hash' appears in docs 1 and 3 (one per batch): df = 1 + 1
    assert(dfm("hash") === 2L)
    assert(dfm("stream") === 1L) // tf 3 in ONE doc: df stays 1
    val st = SnapTxn.read(spark, txroot, "stats")
      .orderBy("batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // batch 0: 2 docs, 4+4 tokens; batch 1 cumulative: 4 docs, 15 tokens
    assert(st === Array((0L, 2L, 8L), (1L, 4L, 15L)))
  }

  test("serving from the pinned index equals the from-scratch ranker " +
      "on the fixture corpus (the oracle's own equality)") {
    val txroot = freshTx()
    val docs = spark.read
      .parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", $"text")
    Bm25Index.ingest(spark, txroot, docs.filter($"doc_id" % 2 === 0), 0L)
    Bm25Index.ingest(spark, txroot, docs.filter($"doc_id" % 2 === 1), 1L)
    val served = Bm25Index.serve(spark, txroot).collect().toSeq
    val scratch = graft.SparkEntry.queries("text_bm25_topk")(
      spark, TestSpark.Sf).collect().toSeq
    assert(served === scratch)
    assert(served.nonEmpty)
  }

  test("hybrid_index_serve fuses the two index-served rankers with " +
      "exact RRF arithmetic and total-order ranks") {
    val out = graft.ops.Wave63Ops.queries
      .find(_.name == "hybrid_index_serve").get.fn(spark, TestSpark.Sf)
      .collect()
    assert(out.nonEmpty)
    // per query: ranks are 1..k (total order), and every rrf equals
    // the closed form over its own r_lex/r_vec at the house rounding
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq ===
        (1L to rows.length.toLong))
    }
    out.foreach { r =>
      val rl = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val rv = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(rl.isDefined || rv.isDefined)
      val want = math.round((rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)) * 1e6) / 1e6
      assert(r.getDouble(5) === want)
    }
  }

  test("replayed micro-batch id is a no-op; four pins move in lockstep") {
    val txroot = freshTx()
    Bm25Index.ingest(spark, txroot, df(b1), 0L)
    Bm25Index.ingest(spark, txroot, df(b2), 1L)
    val head = SnapTxn.latestTx(txroot)
    assert(Bm25Index.ingest(spark, txroot, df(b2), 1L) === -1L)
    assert(SnapTxn.latestTx(txroot) === head)
    assert(head === 3)
    SnapTxn.txVersions(txroot).foreach { v =>
      val pins = SnapTxn.load(txroot, v).pins
      assert(pins.values.toSet.size === 1,
        s"tx v$v pins moved out of lockstep: $pins")
    }
    // postings grew by exactly the per-batch distinct (doc, tok) pairs
    assert(SnapTxn.read(spark, txroot, "postings").count() ===
      (3L + 2L) + (3L + 3L)) // b1 doc1: 3, doc2: 2; b2 doc3: 3, doc4: 3
  }
}
