package graft

import graft.ops.Wave57Ops
import graft.vec.VecAlgs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MLlib similarity-search twins: seeded algorithms have no DuckDB
  * oracle, so these pin (a) run-to-run determinism under the fixed seed,
  * (b) structural invariants, and (c) LSH recall against the exact
  * brute-force answer.
  */
class Wave57Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def q(name: String) =
    Wave57Ops.queries.find(_.name == name).get.fn(spark, TestSpark.Sf)

  test("vec_kmeans_mllib: deterministic, conserving, sse positive") {
    val a = q("vec_kmeans_mllib").collect()
    val b = q("vec_kmeans_mllib").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq) // same seed
    val total = T(spark, TestSpark.Sf, "embeddings").count()
    assert(a.map(_.getLong(1)).sum === total)
    assert(a.length === 8)
    a.foreach(r => assert(r.getDouble(2) >= 0.0))
    // size-sorted report: n_vecs non-increasing
    assert(a.map(_.getLong(1)).toSeq ===
      a.map(_.getLong(1)).sortBy(-_).toSeq)
  }

  test("vec_rp_lsh_mllib: exact-reranked candidates recall the true 5-NN") {
    val got = q("vec_rp_lsh_mllib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force 5-NN per query by cosine (ties by id), driver-side
    val vecs = T(spark, TestSpark.Sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val exact = Seq(5L, 17L, 42L).flatMap { qid =>
      val qv = vecs.find(_._1 == qid).get._2
      vecs.filter(v => v._1 != qid && VecAlgs.dot(v._2, v._2) > 0)
        .map { case (vid, v) => (vid, VecAlgs.cosine(qv, v)) }
        .sortBy { case (vid, sim) => (-sim, vid) }
        .take(5).map { case (vid, _) => (qid, vid) }
    }.toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    // 4 hash tables over 64-dim embeddings: near-perfect on the fixture
    assert(recall >= 0.8, s"LSH recall $recall below 0.8; got=$got")
  }
}
