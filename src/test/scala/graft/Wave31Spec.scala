package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-31 semantics vs in-memory recomputes. */
class Wave31Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("agg_listagg_native: WITHIN GROUP ordering matches the " +
      "collect_list composition") {
    val got = SparkEntry.queries("agg_listagg_native")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val want = T(spark, TestSpark.Sf, "nation")
      .join(T(spark, TestSpark.Sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (rn, ns) =>
        val names = ns.map(_._2).sorted
        (rn, names.mkString("|"),
          names.map(_.take(1)).distinct.sorted.mkString(""))
      }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("agg_percentile_within_group: DISC returns an actual value at " +
      "cume_dist ≥ 0.9 and CONT the interpolated median") {
    val got = SparkEntry.queries("agg_percentile_within_group")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    val cents = T(spark, TestSpark.Sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    got.foreach { case (pri, n, med, p90) =>
      val xs = cents(pri)
      assert(n == xs.length.toLong)
      // disc: smallest value with cume_dist >= 0.9
      val idx = xs.indices.find(i => (i + 1).toDouble / xs.length >= 0.9).get
      assert(p90 == xs(idx), s"$pri disc")
      assert(xs.contains(p90), s"$pri disc is an actual data value")
      val pos = 0.5 * (xs.length - 1)
      val cont = xs(pos.toInt) +
        (pos - pos.toInt) * (xs(math.ceil(pos).toInt) - xs(pos.toInt))
      assert(med == math.round(cont / 100.0).toDouble, s"$pri cont")
    }
  }

  test("agg_bitmap_native: bitmap distinct equals exact distinct") {
    val got = SparkEntry.queries("agg_bitmap_native")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = T(spark, TestSpark.Sf, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("source_xml: the XML roundtrip preserves rows, types, and sums") {
    val got = SparkEntry.queries("source_xml")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = T(spark, TestSpark.Sf, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("c_acctbal") * 100).cast("long")) / 100)
          .as("balance"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("table_merge_api: the builder's clauses apply like the equivalent " +
      "SQL MERGE") {
    val got = SparkEntry.queries("table_merge_api")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = T(spark, TestSpark.Sf, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .flatMap { case (k, p) =>
        val inSrc = k % 5 == 0 || k < 200
        if (inSrc && k % 25 == 0) None
        else Some((k % 10, math.round((if (inSrc) p + 250 else p) * 100)))
      }
      .groupBy(_._1).map { case (b, rs) =>
        (b, rs.length.toLong, rs.map(_._2).sum / 100.0)
      }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
  }
}
