package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 49: offline model-eval metrics over the LCG surrogate scorer. */
class Wave49Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("ml_auc_roc: surrogate scorer beats chance, gini = 2*auc - 1, " +
      "and pos/neg counts partition the table") {
    val r = SparkEntry.queries("ml_auc_roc")(spark, TestSpark.Sf)
      .collect().head
    val np = r.getAs[Long]("n_pos"); val nn = r.getAs[Long]("n_neg")
    val auc = r.getAs[Double]("auc")
    val n = T(spark, TestSpark.Sf, "orders").count()
    assert(np + nn == n && np > 0 && nn > 0)
    // score = (u + y)/2 separates classes almost surely: any positive
    // scores >= 0.5, any negative < 0.5 -> AUC must be ~1, certainly > 0.9
    assert(auc > 0.9 && auc <= 1.0)
    assert(math.abs(r.getAs[Double]("gini") - (2 * auc - 1)) < 2e-6)
  }

  test("ml_pr_curve: recall is monotone non-increasing in threshold, " +
      "endpoints are sane, and tp+fn = n_pos everywhere") {
    val rows = SparkEntry.queries("ml_pr_curve")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("tp"),
        r.getAs[Long]("fp"), r.getAs[Long]("fn"),
        r.getAs[Double]("precision"), r.getAs[Double]("recall")))
    assert(rows.nonEmpty && rows.length <= 101)
    val npos = rows.head._2 + rows.head._4
    rows.foreach { case (_, tp, fp, fn, p, rec) =>
      assert(tp + fn == npos)
      assert(p >= 0 && p <= 1 && rec >= 0 && rec <= 1)
      assert(tp + fp > 0)
    }
    // ordered by ascending threshold -> recall non-increasing
    val recs = rows.map(_._6)
    assert(recs.zip(recs.tail).forall { case (a, b) => a >= b - 1e-9 })
    assert(recs.head == 1.0) // lowest threshold predicts everything
  }

  test("ml_calibration_bins: weights sum to 1, gap = |acc - conf|, " +
      "and every bin's conf lies inside the bin") {
    val rows = SparkEntry.queries("ml_calibration_bins")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Double]("weight"),
        r.getAs[Double]("conf"), r.getAs[Double]("acc"),
        r.getAs[Double]("gap")))
    assert(rows.map(_._1).toSet.subsetOf((0L to 9L).toSet))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    rows.foreach { case (bin, _, conf, acc, gap) =>
      assert(conf >= bin / 10.0 - 1e-6 && conf <= (bin + 1) / 10.0 + 1e-6)
      assert(math.abs(gap - math.abs(acc - conf)) < 2e-6)
    }
  }

  test("ml_f1_multiclass: 5 classes, diagonal dominates (keep-prob 0.6), " +
      "and f1 is the harmonic mean of the reported p/r") {
    val rows = SparkEntry.queries("ml_f1_multiclass")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("cls"), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_pred"), r.getAs[Long]("tp"),
        r.getAs[Double]("precision"), r.getAs[Double]("recall"),
        r.getAs[Double]("f1")))
    assert(rows.length == 5)
    val totTrue = rows.map(_._2).sum
    assert(totTrue == T(spark, TestSpark.Sf, "orders").count())
    assert(rows.map(_._3).sum == totTrue) // preds partition the table too
    rows.foreach { case (_, nt, _, tp, p, rec, f1) =>
      // recall floor: 60% of rows keep the true class, plus lucky flips
      assert(rec > 0.5, s"recall $rec should exceed the 0.6 keep rate floor")
      assert(tp <= nt)
      if (tp > 0) {
        val want = 2 * p * rec / (p + rec)
        assert(math.abs(f1 - want) < 2e-6)
      }
    }
  }
}
