package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-16 semantics vs in-memory recomputes. */
class Wave16Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("events_bot_regularity: cv matches the per-user recompute") {
    val got = SparkEntry.queries("events_bot_regularity")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.nonEmpty)
    got.foreach { case (_, n, cv, bot) =>
      assert(n >= 5 && cv >= 0 && bot == (cv < 0.5))
    }
    // recompute the busiest user's cv from raw timestamps
    val probe = got.maxBy(_._2)._1
    val ts = T(spark, TestSpark.Sf, "events")
      .filter(col("user_id") === probe)
      .select(unix_timestamp(col("ts")).as("s"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).map(_._1)
    val gaps = ts.sliding(2).map { case Array(a, b) => b - a }.toSeq
    val n = gaps.size.toLong
    val (s1, s2) = (gaps.sum, gaps.map(g => g * g).sum)
    val cv = math.sqrt((n * s2 - s1 * s1).toDouble) / s1
    assert(math.abs(got.find(_._1 == probe).get._3 -
      math.round(cv * 1e6) / 1e6) < 1e-9)
  }

  test("data_split_leakage: reported groups truly cross the split") {
    val got = SparkEntry.queries("data_split_leakage")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "the planted duplicates must fire the screen")
    val membership = T(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"),
        md5(concat_ws(" ",
          array_sort(array_distinct(split(col("text"), " ")))))
          .as("fp"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    got.foreach { case (fp, nTrain, nTest) =>
      val ids = membership(fp)
      assert(ids.count(_ % 10 < 8) == nTrain, fp)
      assert(ids.count(_ % 10 >= 8) == nTest, fp)
      assert(nTrain >= 1 && nTest >= 1)
    }
  }

  test("agg_hhi_index: bounds and single-nation recompute") {
    val got = SparkEntry.queries("agg_hhi_index")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (nk, suppliers, hhi) =>
      // HHI ranges from 1/n (even split) to 1 (monopoly); the integer
      // grid can undershoot 1/n by at most n ulps of 1e-9
      assert(hhi > 0 && hhi <= 1.0, s"nation $nk")
      assert(hhi >= 1.0 / suppliers - suppliers * 1e-9,
        s"nation $nk: $hhi below even-split floor for $suppliers")
    }
    val probe = got.head._1
    val cents = T(spark, TestSpark.Sf, "lineitem")
      .join(T(spark, TestSpark.Sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") === probe)
      .groupBy("s_suppkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("c"))
      .collect().map(_.getLong(1))
    val total = cents.sum
    val hhi = cents.map(c => { val r = c * 1000000000L / total; r * r })
      .sum.toDouble / 1e18
    assert(math.abs(got.find(_._1 == probe).get._3 -
      math.round(hhi * 1e8) / 1e8) < 1e-12)
  }

  test("sql_star_except drops exactly the excluded columns") {
    val df = SparkEntry.queries("sql_star_except")(spark, TestSpark.Sf)
    assert(df.columns.toSeq ==
      Seq("c_custkey", "c_nationkey", "c_mktsegment"),
      "remaining columns keep their declared order")
    assert(df.count() > 0)
  }
}
