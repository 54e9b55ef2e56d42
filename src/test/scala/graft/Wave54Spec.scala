package graft

import graft.ops.{Wave54Ops, Wave56Ops}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-level IVF operators: the probe path must actually PRUNE the index
  * scan to the probed coarse partitions, and both routing layers must be
  * live at fixture scale (the reduced cap exists precisely for that).
  */
class Wave54Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def q(name: String) =
    (Wave54Ops.queries ++ Wave56Ops.queries)
      .find(_.name == name).get.fn(spark, TestSpark.Sf)

  private lazy val nVecs =
    T(spark, TestSpark.Sf, "embeddings").count()

  test("vec_knn_probe_2level prunes the index scan and ranks top-5") {
    // the partition-pruning plan assertion moved IN-OP (the op is eager
    // now — the returned frame reads the scratch result, so the probe
    // plan only exists inside the op; a require() there fails the run
    // if pruning is lost)
    val df = q("vec_knn_probe_2level")
    val rows = df.collect()
    assert(rows.length === 15) // 3 queries x top-5
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1L to 5L))
      assert(rs.forall(r => math.abs(r.getDouble(2)) <= 1.0000001))
    }
  }

  test("vec_semdedup_2level: both layers live, counts conserve") {
    val rows = q("vec_semdedup_2level").collect()
    assert(rows.map(_.getLong(2)).sum === nVecs) // n_vecs conserves
    assert(rows.map(_.getLong(1)).distinct.length > 1,
      "second routing layer never split a coarse cell — cap too high " +
        "for the fixture, the two-level path is not being exercised")
    rows.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <=
      r.getLong(2)))
  }

  test("vec_incremental_semdedup: per-batch counts conserve (3-batch)") {
    val rows = q("vec_incremental_semdedup").collect()
    // round-12 cadence: batch 2 (ids ≡ 1 mod 3) probes the b1 index and
    // is absorbed; batch 3 (ids ≡ 2) probes the union — every probed
    // row appears in exactly one (batch, cell) group
    for ((batch, residue) <- Seq((2L, 1), (3L, 2))) {
      val expect = T(spark, TestSpark.Sf, "embeddings")
        .filter(col("vec_id") % 3 === residue).count()
      assert(rows.filter(_.getLong(0) == batch)
        .map(_.getLong(2)).sum === expect, s"batch $batch n_new")
    }
    rows.foreach(r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2)))
  }
}
