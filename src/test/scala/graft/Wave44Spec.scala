package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 44: trimmed means, sort-key advisor, any-order funnel,
  * Theil-Sen. */
class Wave44Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("agg_trimmed_mean: both robust means are inside the data range " +
      "and the trim keeps ~80% of rows") {
    val rows = SparkEntry.queries("agg_trimmed_mean")(
      spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val kept = r.getAs[Long]("n_kept")
      val tm = r.getAs[Double]("trimmed_mean")
      val wm = r.getAs[Double]("winsorized_mean")
      assert(kept <= n && kept >= (n * 0.7).toLong,
        s"trim kept $kept of $n")
      assert(tm > 0 && wm > 0)
      // winsorized pulls toward the center less than trimming removes:
      // both must be within 50% of each other on this data
      assert(math.abs(tm - wm) / wm < 0.5)
    }
  }

  test("data_sortkey_advisor: run counts are bounded by n and at least " +
      "the distinct count") {
    val rows = SparkEntry.queries("data_sortkey_advisor")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("column_name"), r.getAs[Long]("n"),
        r.getAs[Long]("rle_runs"), r.getAs[Long]("n_distinct"),
        r.getAs[Double]("rle_ratio")))
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("o_orderpriority", "o_orderstatus"))
    rows.foreach { case (_, n, runs, nd, ratio) =>
      assert(runs >= nd && runs <= n)
      assert(ratio > 0 && ratio <= 1)
    }
    // fewer categories must not produce more runs-per-row than the
    // higher-cardinality column on random data
    val byName = rows.map(r => r._1 -> r._5).toMap
    assert(byName("o_orderstatus") <= byName("o_orderpriority") + 0.05)
  }

  test("events_any_order_funnel: combination census is consistent") {
    val r = SparkEntry.queries("events_any_order_funnel")(
      spark, TestSpark.Sf).collect().head
    val n = r.getAs[Long]("n_users")
    val all3 = r.getAs[Long]("n_all_three")
    assert(all3 <= math.min(r.getAs[Long]("n_view"),
      math.min(r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase"))))
    assert(r.getAs[Double]("conversion_rate") ==
      math.round(all3.toDouble / n * 1e6) / 1e6)
  }

  test("ts_theil_sen: pair count is C(days,2) and the robust slope is " +
      "finite") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("ts_theil_sen")(spark, TestSpark.Sf)
      .collect().head
    val days = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderdate").cast("date")).distinct().count()
    assert(r.getAs[Long]("n_pairs") == days * (days - 1) / 2)
    assert(!r.getAs[Double]("ts_slope").isNaN)
  }
}
