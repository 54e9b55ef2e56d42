package graft

import graft.text.SplitMix64
import graft.vec.VecAlgs
import org.scalatest.funsuite.AnyFunSuite

class VectorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("cosine bounds and symmetry (100 seeded cases)") {
    val rng = new SplitMix64(99L)
    def vec() = Array.fill(16)(rng.nextDouble() * 2 - 1)
    (0 until 100).foreach { _ =>
      val a = vec(); val b = vec()
      val c = VecAlgs.cosine(a, b)
      assert(c >= -1.0000001 && c <= 1.0000001)
      assert(math.abs(c - VecAlgs.cosine(b, a)) < 1e-12)
      assert(math.abs(VecAlgs.cosine(a, a) - 1.0) < 1e-9)
    }
  }

  test("LSH bucketing is deterministic") {
    val planes = VecAlgs.hyperplanes(8, 64, seed = 7L)
    val planes2 = VecAlgs.hyperplanes(8, 64, seed = 7L)
    assert(planes.map(_.toSeq).toSeq == planes2.map(_.toSeq).toSeq)
    val v = Array.tabulate(64)(i => math.sin(i.toDouble))
    assert(VecAlgs.bucket(planes, v) == VecAlgs.bucket(planes2, v))
  }

  test("IVF/LSH 5-NN recall vs exact brute force") {
    val exact = SparkEntry.queries("vec_knn_query")(spark, TestSpark.Sf)
      .collect().map(_.getLong(0)).toSet
    val approx = SparkEntry.queries("vec_knn_ivf")(spark, TestSpark.Sf)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // hamming-1 probing over 8-bit sign-LSH: recall is data-dependent —
    // require a meaningful fraction, exactness is vec_knn_query's job
    assert(recall >= 0.4, s"recall $recall, exact=$exact approx=$approx")
  }

  test("vec_knn_probe prunes index partitions and recalls vs exact 5-NN") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("vec_knn_probe")(spark, TestSpark.Sf)
    // the probed index read must reach the scan as a partition filter on
    // cid (file-level pruning), not a post-scan row filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"no cid partition pruning in plan:\n$plan")
    val rows = df.collect()
    // 3 queries x 5 neighbors, ranks 1..5 each, sims within bounds
    assert(rows.length == 15)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(5L, 17L, 42L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 5L))
      assert(rs.forall(r => math.abs(r.getDouble(3)) <= 1.0000001))
    }
    // recall vs exact brute-force 5-NN per query (nprobe=2 of 4 cells —
    // a meaningful fraction is required, exactness is not the claim)
    val vecs = T(spark, TestSpark.Sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val recalls = Seq(5L, 17L, 42L).map { qid =>
      val qv = vecs.find(_._1 == qid).get._2
      val exact = vecs.filter(_._1 != qid)
        .map { case (id, v) => (VecAlgs.cosine(qv, v), id) }
        .sortBy { case (s, id) => (-s, id) }.take(5).map(_._2).toSet
      val got = byQ(qid).map(_.getLong(2)).toSet
      exact.intersect(got).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall $mean ($recalls)")
  }

  test("exact top-10 pair sim matches a driver-side brute force") {
    import org.apache.spark.sql.functions.col
    val vecs = T(spark, TestSpark.Sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val sims = for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
    } yield (ia, ib,
      BigDecimal(VecAlgs.cosine(va, vb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val expected = sims.sortBy { case (a, b, s) => (-s, a, b) }.take(10)
      .map { case (a, b, s) => (a, b, s) }.toSeq
    val got = SparkEntry.queries("vec_knn_cosine")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == expected)
  }

  test("vec_knn_refine: quantized-coarse + exact-refine equals exact 5-NN") {
    // the coarse stage (top-50 by integer code dot) must have full recall
    // of the true top-5, so the refined result is exactly vec_knn_query's
    val refined = SparkEntry.queries("vec_knn_refine")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = SparkEntry.queries("vec_knn_query")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(refined.nonEmpty && refined == exact)
  }

  test("cell count scales as ceil(sqrt(n)) with floor and broadcast cap") {
    import graft.vec.VecAlgs.cellCount
    // scaling: 100x the data -> 10x the cells, per-cell population ~sqrt(n)
    assert(cellCount(100L) == 10L)
    assert(cellCount(10000L) == 100L)
    assert(cellCount(1000000L) == 1000L)
    assert(cellCount(25L) == 5L && cellCount(26L) == 6L) // ceil
    assert(cellCount(0L) == 1L && cellCount(1L) == 1L)   // floor
    assert(cellCount(Long.MaxValue) == 65536L)           // broadcast cap
    // the parameterized ops follow it on the fixture (n=500 -> 23 cells;
    // vec_semdedup emits one row per non-empty cell, bounded by k and
    // strictly more than the old fixed 16 at this n)
    val n = T(spark, TestSpark.Sf, "embeddings").count()
    val k = cellCount(n)
    assert(k == math.ceil(math.sqrt(n.toDouble)).toLong)
    val cells = SparkEntry.queries("vec_semdedup")(spark, TestSpark.Sf)
      .select("cell").distinct().count()
    assert(cells <= k && cells > 16,
      s"semdedup cells follow cellCount($n)=$k, got $cells")
  }
}
