package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 41: mSPRT, max drawdown, erasure cascade, link prediction. */
class Wave41Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stats_msprt: the always-valid p is in (0, 1] and consistent " +
      "with lambda") {
    val r = SparkEntry.queries("stats_msprt")(spark, TestSpark.Sf)
      .collect().head
    val lam = r.getAs[Double]("lambda")
    val p = r.getAs[Double]("p_av")
    assert(lam > 0)
    assert(p > 0 && p <= 1)
    assert(math.abs(p - math.min(1.0, math.round(1e6 / lam) / 1e6))
      < 2e-6)
    assert(r.getAs[Long]("n0") > 0 && r.getAs[Long]("n1") > 0)
  }

  test("ts_max_drawdown: drawdowns are in [0, 1), sorted desc, and " +
      "peak >= equity everywhere") {
    val rows = SparkEntry.queries("ts_max_drawdown")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("equity"), r.getAs[Long]("peak"),
        r.getAs[Double]("dd")))
    assert(rows.length == 5)
    assert(rows.forall { case (e, p, d) => p >= e && d >= 0 && d < 1 })
    val d = rows.map(_._3)
    assert(d.zip(d.tail).forall { case (a, b) => a >= b })
  }

  test("data_right_to_erasure: audit covers the four tables and " +
      "purged + kept equals each table's total") {
    val byName = SparkEntry.queries("data_right_to_erasure")(
      spark, TestSpark.Sf).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("purged"), r.getAs[Long]("kept"))).toMap
    assert(byName.keySet ==
      Set("customer", "orders", "lineitem", "events"))
    // the seeded request set is non-empty and the cascade reaches the
    // fact tables
    assert(byName("customer")._1 > 0)
    assert(byName("orders")._1 > 0)
    assert(byName("lineitem")._1 > 0)
    byName.values.foreach { case (p, k) => assert(p >= 0 && k >= 0) }
  }

  test("graph_link_prediction: predicted pairs are oriented, scored " +
      "desc, and none is an existing edge (score implies >=1 common " +
      "neighbor)") {
    val rows = SparkEntry.queries("graph_link_prediction")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("w"),
        r.getAs[Double]("score"), r.getAs[Long]("common")))
    assert(rows.length == 10)
    assert(rows.forall { case (u, w, s, c) => u < w && s > 0 && c >= 1 })
    val s = rows.map(_._3)
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
  }
}
