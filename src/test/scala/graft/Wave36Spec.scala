package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 36: KMV sketch, HDR histogram, BH-FDR, CUPED. */
class Wave36Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("agg_kmv_distinct: estimate within the k=256 error envelope, " +
      "exact when the distinct count is under k") {
    val rows = SparkEntry.queries("agg_kmv_distinct")(spark, TestSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact")
      val est = r.getAs[Double]("est")
      val relErr = r.getAs[Double]("rel_err")
      if (exact < 256) assert(est == exact.toDouble,
        s"${r.getString(0)}: sub-k type must be exact, est=$est n=$exact")
      // KMV k=256 has σ ≈ 1/√(k−2) ≈ 6.3%; 4σ envelope
      else assert(relErr < 0.25,
        s"${r.getString(0)}: rel_err $relErr out of envelope")
    }
  }

  test("agg_hdr_histogram: bit-length buckets bound their values and " +
      "cum_pct is monotone to 100") {
    val rows = SparkEntry.queries("agg_hdr_histogram")(spark, TestSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val loCents = math.round(r.getAs[Double]("lo") * 100)
      val hiCents = math.round(r.getAs[Double]("hi") * 100)
      assert(loCents >= (1L << (b - 1)) && hiCents < (1L << b),
        s"bucket $b holds [$loCents,$hiCents] outside [2^${b - 1},2^$b)")
    }
    val cum = rows.map(_.getAs[Double]("cum_pct"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(math.abs(cum.last - 100.0) < 1e-6)
  }

  test("stats_bh_fdr: rejections are exactly a prefix of the p-sorted " +
      "tests (the step-up property)") {
    val rows = SparkEntry.queries("stats_bh_fdr")(spark, TestSpark.Sf)
      .collect()
    assert(rows.length >= 20) // one test per nation
    val ps = rows.map(_.getAs[Double]("p"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b },
      "output is ordered by ascending p")
    val rejects = rows.map(_.getAs[Boolean]("reject"))
    val k = rejects.count(identity)
    assert(rejects.take(k).forall(identity) &&
      rejects.drop(k).forall(!_),
      "BH rejects a prefix, never a gap")
    // every rejected p clears its own BH threshold
    val m = rows.length
    rows.filter(_.getAs[Boolean]("reject")).foreach { r =>
      val i = r.getAs[Long]("i")
      assert(r.getAs[Double]("p") <= 0.10 * (k.toDouble / m) ||
        r.getAs[Double]("p") <= 0.10 * (i.toDouble / m) ||
        i <= k, s"row $i inside the step-up prefix")
    }
  }

  test("stats_cuped: theta from exact sums, variance reduction in " +
      "[0, 100]") {
    val rows = SparkEntry.queries("stats_cuped")(spark, TestSpark.Sf)
      .collect()
    assert(rows.length == 5) // one per market segment
    rows.foreach { r =>
      val red = r.getAs[Double]("var_reduction_pct")
      assert(red >= 0.0 && red <= 100.0, s"rho^2 out of range: $red")
      assert(!r.getAs[Double]("theta").isNaN)
    }
  }
}
