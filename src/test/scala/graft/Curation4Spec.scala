package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave-4 curation ops: split completeness/stability, interleave
  * fairness, packing contiguity, funnel monotonicity.
  */
class Curation4Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("data_split_hash: splits partition the corpus; membership is stable") {
    val rows = SparkEntry.queries("data_split_hash")(spark, TestSpark.Sf)
      .collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = T(spark, TestSpark.Sf, "documents").count()
    assert(total == nDocs)
    // train dominates: hash thresholds actually split ~80/10/10
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
  }

  test("data_interleave_sources: positions realize the round-robin schedule") {
    val rows = SparkEntry.queries("data_interleave_sources")(
      spark, TestSpark.Sf).collect()
    // recompute the schedule driver-side: src_rank by sorted source name,
    // rn by doc_id within source, pos = (rn-1)*n_src + src_rank
    val docs = T(spark, TestSpark.Sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val srcRank = docs.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    val expected = docs.groupBy(_._2).iterator.flatMap { case (src, ds) =>
      ds.map(_._1).sorted.zipWithIndex.map { case (id, i) =>
        id -> (i.toLong * srcRank.size + srcRank(src))
      }
    }.toMap
    assert(rows.length == docs.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("pos") == expected(r.getAs[Long]("doc_id")),
        r.toString)
    }
    // positions are unique and the result arrives pos-sorted
    val ps = rows.map(_.getAs[Long]("pos"))
    assert(ps.distinct.length == ps.length)
    assert(ps.sameElements(ps.sorted))
  }

  test("data_pack_ctx: per-shard streams are contiguous and start at 0") {
    val rows = SparkEntry.queries("data_pack_ctx")(spark, TestSpark.Sf)
      .collect()
    rows.groupBy(_.getAs[String]("shard")).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_.getAs[Long]("start_tok"))
      assert(sorted.head.getAs[Long]("start_tok") == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("start_tok") + a.getAs[Long]("toks") ==
            b.getAs[Long]("start_tok"))
        case _ => ()
      }
      // bin ids consistent with offsets
      sorted.foreach { d =>
        assert(d.getAs[Long]("first_bin") == d.getAs[Long]("start_tok") / 512)
        assert(d.getAs[Long]("last_bin") ==
          (d.getAs[Long]("start_tok") + d.getAs[Long]("toks") - 1) / 512)
      }
    }
  }

  test("winnow: every window of w grams contains a selected fingerprint") {
    val rng = new graft.text.SplitMix64(7L)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (_ <- 1 to 50) {
      val n = 3 + (rng.nextLong() & 0x3f).toInt
      val toks = Seq.fill(n)(vocab((rng.nextLong() & 0x7).toInt))
      val fps = graft.text.TextAlgs.winnow(toks, k = 3, w = 4)
      val nGrams = n - 2
      if (nGrams > 0) {
        assert(fps.nonEmpty)
        val pos = fps.map(_._1).toSet
        for (start <- 0 to math.max(0, nGrams - 4)) {
          assert((start until math.min(start + 4, nGrams))
            .exists(pos.contains), s"uncovered window at $start, n=$n")
        }
        // selections are monotone positions with in-window gaps
        assert(fps.map(_._1) == fps.map(_._1).sorted)
      } else assert(fps.isEmpty)
    }
  }

  test("winnow: a shared token run of >= w+k-1 tokens shares a fingerprint") {
    val rng = new graft.text.SplitMix64(99L)
    val vocab = Vector("p", "q", "r", "s", "t", "u", "v", "w", "x", "y")
    def rand(n: Int) = Seq.fill(n)(vocab((rng.nextLong() & 0x7).toInt))
    for (_ <- 1 to 20) {
      val shared = rand(6) // w + k - 1 = 6
      val docA = rand(10) ++ shared ++ rand(10)
      val docB = rand(7) ++ shared ++ rand(12)
      val fpA = graft.text.TextAlgs.winnow(docA).map(_._2).toSet
      val fpB = graft.text.TextAlgs.winnow(docB).map(_._2).toSet
      assert(fpA.intersect(fpB).nonEmpty)
    }
  }

  test("text_filter_funnel: survivor counts decrease monotonically") {
    val ns = SparkEntry.queries("text_filter_funnel")(spark, TestSpark.Sf)
      .collect().sortBy(_.getAs[Long]("stage_id")).map(_.getAs[Long]("n_docs"))
    assert(ns.length == 5)
    ns.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => () }
    assert(ns.head == T(spark, TestSpark.Sf, "documents").count())
    assert(ns.last > 0)
  }
}
