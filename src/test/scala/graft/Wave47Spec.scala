package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 47: FK orphan audit, burn-rate alert, Beta posterior. */
class Wave47Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("data_fk_orphans: audits all four FK edges; the synthetic star " +
      "schema is referentially intact") {
    val rows = SparkEntry.queries("data_fk_orphans")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("fk_edge"), r.getAs[Long]("n_child"),
        r.getAs[Long]("n_orphans"), r.getAs[Double]("orphan_pct")))
    assert(rows.map(_._1).toSeq == Seq("lineitem->orders",
      "lineitem->part", "lineitem->supplier", "orders->customer"))
    rows.foreach { case (e, n, o, pct) =>
      assert(n > 0, e)
      assert(o >= 0 && o <= n, e)
      assert(pct >= 0 && pct <= 100, e)
    }
  }

  test("events_burn_rate_alert: every paged hour burns both windows " +
      "above 2x budget") {
    val rows = SparkEntry.queries("events_burn_rate_alert")(
      spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty, "fixture error rate (~20%) must page")
    rows.foreach { r =>
      assert(r.getAs[Double]("burn6") > 2.0)
      assert(r.getAs[Double]("burn24") > 2.0)
      assert(r.getAs[Boolean]("page"))
    }
  }

  test("stats_beta_posterior: posterior means are shrunk toward 1/2 " +
      "relative to the MLE and the CI contains the mean") {
    val rows = SparkEntry.queries("stats_beta_posterior")(
      spark, TestSpark.Sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val k = r.getAs[Long]("k")
      val pm = r.getAs[Double]("post_mean")
      val mle = k.toDouble / n
      // posterior mean lies between the MLE and 0.5
      val lo = math.min(mle, 0.5) - 1e-6
      val hi = math.max(mle, 0.5) + 1e-6
      assert(pm >= lo && pm <= hi)
      assert(r.getAs[Double]("ci_lo") <= pm && pm <=
        r.getAs[Double]("ci_hi"))
    }
  }
}
