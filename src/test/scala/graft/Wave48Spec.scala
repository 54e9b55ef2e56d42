package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 48: cluster purity, nested pruning, Gini splits. */
class Wave48Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("vec_cluster_purity: purity in (0,1], cluster count ~ sqrt(n), " +
      "and labels make purity beat the majority-class baseline floor") {
    val r = SparkEntry.queries("vec_cluster_purity")(
      spark, TestSpark.Sf).collect().head
    val nc = r.getAs[Long]("n_clusters"); val np = r.getAs[Long]("n_points")
    val purity = r.getAs[Double]("purity")
    assert(nc >= 1 && nc <= math.ceil(math.sqrt(np.toDouble)).toLong)
    assert(purity > 0 && purity <= 1)
    assert(r.getAs[Double]("singleton_frac") >= 0 &&
      r.getAs[Double]("singleton_frac") <= 1)
  }

  test("sink_nested_prune: roundtrip aggregate equals the direct " +
      "aggregate (and the in-op ReadSchema assertion held)") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("sink_nested_prune")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("status"), r.getAs[Long]("n")))
    val want = T(spark, TestSpark.Sf, "orders")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n")))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("ml_best_split_gini: splits are scored ascending and every " +
      "impurity is in [0, 0.5]") {
    val rows = SparkEntry.queries("ml_best_split_gini")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("split_at_kusd"), r.getAs[Long]("nl"),
        r.getAs[Long]("nr"), r.getAs[Double]("weighted_gini")))
    assert(rows.length == 5)
    rows.foreach { case (_, nl, nr, g) =>
      assert(nl > 0 && nr > 0)
      assert(g >= 0 && g <= 0.5 + 1e-9)
    }
    val g = rows.map(_._4)
    assert(g.zip(g.tail).forall { case (a, b) => a <= b })
  }
}
