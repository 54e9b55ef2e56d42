package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-17 semantics vs in-memory recomputes. */
class Wave17Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("ts_seasonal_anomaly: z-scores match the per-hour recompute") {
    val got = SparkEntry.queries("ts_seasonal_anomaly")(
      spark, TestSpark.Sf).collect()
      .map(r => ((r.getAs[java.sql.Date]("day").toLocalDate,
        r.getLong(1)), (r.getLong(2), r.getDouble(3),
        r.getBoolean(4))))
    assert(got.nonEmpty)
    got.foreach { case (_, (_, z, flag)) =>
      assert(flag == (math.abs(z) >= 2.0))
    }
    // recompute one hour-of-day's z-scores from the raw buckets
    val buckets = got.groupBy(_._1._2)
    val (hod, rows) = buckets.maxBy(_._2.size)
    val ns = rows.map(_._2._1)
    val k = ns.size.toLong
    val (s1, s2) = (ns.sum, ns.map(n => n * n).sum)
    rows.foreach { case ((day, _), (n, z, _)) =>
      val expect = (n * k - s1).toDouble /
        (math.sqrt((k * s2 - s1 * s1).toDouble) * math.sqrt(k.toDouble))
      assert(math.abs(z - math.round(expect * 1e4) / 1e4) < 1e-9,
        s"hod $hod day $day")
    }
    // the mean of z within an hour is ~0 by construction
    val zs = rows.map(_._2._2)
    assert(math.abs(zs.sum / zs.size) < 0.01)
  }

  test("agg_customer_growth: monotone, ends at the customer count") {
    val got = SparkEntry.queries("agg_customer_growth")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[java.sql.Date]("mo").toLocalDate,
        r.getLong(1), r.getLong(2)))
    assert(got.length > 10, "first orders spread over many months")
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._1.isAfter(a._1) && b._3 == a._3 + b._2)
      case _ => ()
    }
    val customersWithOrders = T(spark, TestSpark.Sf, "orders")
      .select("o_custkey").distinct().count()
    assert(got.last._3 == customersWithOrders)
    assert(got.map(_._2).sum == customersWithOrders)
  }

  test("agg_basket_lift matches the direct contingency recompute") {
    val got = SparkEntry.queries("agg_basket_lift")(spark, TestSpark.Sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3))))
    assert(got.nonEmpty)
    got.foreach { case ((a, b), _) => assert(a < b, "oriented pairs") }
    val baskets = T(spark, TestSpark.Sf, "lineitem")
      .join(T(spark, TestSpark.Sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nOrders = baskets.map(_._1).distinct.length
    val single = baskets.groupBy(_._2).view.mapValues(_.size).toMap
    val pairCounts = baskets.groupBy(_._1).values.flatMap { g =>
      val bs = g.map(_._2).distinct.sorted
      for (i <- bs.indices; j <- i + 1 until bs.size)
        yield (bs(i), bs(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    got.foreach { case ((a, b), (nab, lift)) =>
      assert(pairCounts((a, b)) == nab, s"($a,$b)")
      val expect = nab.toDouble * nOrders /
        (single(a).toLong * single(b))
      assert(math.abs(lift - math.round(expect * 1e4) / 1e4) < 1e-9)
    }
    // completeness: every pair meeting the support threshold reports
    assert(got.length == pairCounts.count(_._2 >= 20))
  }

  test("set_union_by_name aligns columns by name across legs") {
    val df = SparkEntry.queries("set_union_by_name")(spark, TestSpark.Sf)
    assert(df.columns.toSeq == Seq("k", "seg", "src"))
    val rows = df.collect()
    rows.foreach { r =>
      val k = r.getLong(0); val src = r.getString(2)
      assert((k % 3 == 0 && src == "a") || (k % 3 == 1 && src == "b"),
        s"row $r landed in the wrong leg")
    }
  }
}
