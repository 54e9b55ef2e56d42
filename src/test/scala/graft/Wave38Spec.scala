package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave 38: table profile, stopword detection, holdout perplexity,
  * class weights.
  */
class Wave38Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("data_profile_table: one row per column, numeric min/max in " +
      "value order, full completeness on the fixture") {
    val rows = SparkEntry.queries("data_profile_table")(
      spark, TestSpark.Sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("completeness") == 1.0,
        s"${r.getString(0)} fixture has no nulls")
      assert(r.getAs[Long]("n_distinct") > 0)
    }
    val ok = rows.find(_.getString(0) == "o_orderkey").get
    // numeric order, not lexicographic: min "1" like, max larger value
    assert(ok.getAs[String]("min_val").toLong <
      ok.getAs[String]("max_val").toLong)
  }

  test("text_stopword_detect: every reported token clears the 40% df " +
      "threshold and common fixture words surface") {
    val rows = SparkEntry.queries("text_stopword_detect")(
      spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("df_pct") > 40.0 - 1e-9,
        s"${r.getString(1)}: ${r.getAs[Double]("df_pct")}")
    }
    // 'the' is near-universal in the synthetic corpus
    assert(rows.exists(_.getString(1) == "the"))
  }

  test("text_lm_holdout_ppl: cross-entropy is positive, finite, and " +
      "above the vocabulary floor for every language") {
    val rows = SparkEntry.queries("text_lm_holdout_ppl")(
      spark, TestSpark.Sf).collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      val ce = r.getAs[Double]("cross_entropy_nats")
      assert(ce > 0 && ce < 20 && !ce.isNaN, s"${r.getString(0)}: $ce")
      assert(r.getAs[Long]("n_bigrams") > 0)
    }
  }

  test("data_class_weights: weights rebalance exactly — the weighted " +
      "sample sizes equalize and shares sum to 100") {
    val rows = SparkEntry.queries("data_class_weights")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Double]("weight"), r.getAs[Double]("share_pct")))
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    val k = rows.length
    rows.foreach { case (lang, src, n, w, _) =>
      // w = N/(k*n) -> n*w = N/k for every stratum (rounding at 1e-6)
      assert(math.abs(n * w - total.toDouble / k) < total * 1e-5,
        s"$lang/$src: $n * $w vs ${total.toDouble / k}")
    }
    assert(math.abs(rows.map(_._5).sum - 100.0) < 0.05)
  }
}
