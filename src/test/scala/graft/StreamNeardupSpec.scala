package graft

import graft.ops.Wave58Ops
import graft.ops.Wave58Ops.{DocIn, DupHit}
import graft.text.TextAlgs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Online near-dup (stream_neardup_live): the streaming pipeline must
  * find exactly the pairs a driver-side replay of the same banding +
  * exact-Jaccard verification finds, and its bucket state must carry
  * across micro-batches.
  */
class StreamNeardupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side replay: all (a<b) pairs sharing >= 1 LSH band bucket
    * with exact token-set Jaccard >= 0.8 — compared at the SAME 1e-6
    * rounding the stream applies (jac6), so a pair landing in
    * [0.7999995, 0.8) is accepted by both sides, never just one. */
  private def replay(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    val feats = docs.map { case (id, t) =>
      val dist = t.split(" ").toSeq.distinct
      (id, TextAlgs.lshBands(TextAlgs.minhash(dist)).toSet,
        dist.toSet)
    }
    (for {
      a <- feats; b <- feats
      if a._1 < b._1 && (a._2 intersect b._2).nonEmpty
      if math.round(TextAlgs.jaccard(a._3, b._3) * 1e6) / 1e6 >= 0.8
    } yield (a._1, b._1)).toSet
  }

  private def runStream(batches: Seq[Seq[DocIn]]): Set[(Long, Long)] = {
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[DocIn]
      val sink = s"neardup_twin_${System.nanoTime()}"
      val q = Wave58Ops.neardupStream(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        spark.table(sink).as[DupHit].collect()
          .map(h => (h.doc_a, h.doc_b)).toSet
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("stream pairs equal the driver-side banded replay (fixture corpus)") {
    val docs = T(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = runStream(Seq(docs.map { case (id, t) => DocIn(id, t) }))
    assert(got === replay(docs))
    assert(got.nonEmpty, "fixture corpus has no near-dups — test is vacuous")
  }

  test("bucket state carries across micro-batches") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 39).map(i => s"tok$i") :+ "novel").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val got = runStream(Seq(
      Seq(DocIn(1L, base), DocIn(2L, other)),   // batch 1
      Seq(DocIn(3L, near))))                    // batch 2: dup of doc 1
    assert(got === Set((1L, 3L)))
  }
}
