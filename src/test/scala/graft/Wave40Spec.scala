package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 40: BM25, PMI collocations, RRF fusion, DiD, Kaplan-Meier. */
class Wave40Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("text_bm25: scores are positive, sorted desc, and every hit " +
      "matched at least one of the three query terms") {
    val rows = SparkEntry.queries("text_bm25")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"),
        r.getAs[Long]("n_terms")))
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_._2 > 0))
    assert(rows.forall(r => r._3 >= 1 && r._3 <= 3))
    val s = rows.map(_._2)
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
  }

  test("text_pmi_collocations: counts respect the min-support gate and " +
      "pmi is finite") {
    val rows = SparkEntry.queries("text_pmi_collocations")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Long]("c_ab"), r.getAs[Double]("pmi")))
    assert(rows.nonEmpty && rows.length <= 15)
    assert(rows.forall(_._3 >= 5))
    assert(rows.forall(r => !r._4.isNaN && !r._4.isInfinite))
    val p = rows.map(_._4)
    assert(p.zip(p.tail).forall { case (a, b) => a >= b })
  }

  test("vec_rrf_fusion: rrf equals the closed form of the two ranks and " +
      "a doc present in both lists beats one at the same rank in only " +
      "one") {
    val rows = SparkEntry.queries("vec_rrf_fusion")(spark, TestSpark.Sf)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val r0 = Option(r.getAs[java.lang.Long]("r0")).map(_.toLong)
      val r1 = Option(r.getAs[java.lang.Long]("r1")).map(_.toLong)
      val want = r0.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        r1.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") -
        math.round(want * 1e6) / 1e6) < 1e-9)
      assert(r0.nonEmpty || r1.nonEmpty)
    }
  }

  test("stats_diff_in_diff: did is the closed form of the four cell " +
      "means and se is positive") {
    val r = SparkEntry.queries("stats_diff_in_diff")(
      spark, TestSpark.Sf).collect().head
    val did = r.getAs[Double]("m_t1") - r.getAs[Double]("m_t0") -
      (r.getAs[Double]("m_c1") - r.getAs[Double]("m_c0"))
    // did column was rounded independently from the four rounded means:
    // agree to the rounding scale
    assert(math.abs(r.getAs[Double]("did") - did) < 2e-4)
    assert(r.getAs[Double]("se") > 0)
  }

  test("stats_kaplan_meier: survival is a monotone non-increasing step " +
      "function in (0, 1] and risk sets shrink") {
    val rows = SparkEntry.queries("stats_kaplan_meier")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d"), r.getAs[Double]("survival")))
    assert(rows.nonEmpty)
    val surv = rows.map(_._4)
    assert(surv.forall(x => x > 0 && x <= 1))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b })
    val risk = rows.map(_._2)
    assert(risk.zip(risk.tail).forall { case (a, b) => a > b })
    assert(rows.forall(r => r._3 >= 1 && r._3 <= r._2))
  }
}
