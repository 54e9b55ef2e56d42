package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-35: the coordination property itself. */
class Wave35Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("data_coordinated_sample: bottom-k-by-hash samples of two tables " +
      "share their key universe (coordination), unlike independent ones") {
    val got = SparkEntry.queries("data_coordinated_sample")(
      spark, TestSpark.Sf).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    // replay: bottom-1000 custkeys by md5 on each table
    def md5s(k: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val custs = T(spark, TestSpark.Sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val orders = T(spark, TestSpark.Sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val csKeys = custs.sortBy(k => (md5s(k), k)).take(1000).toSet
    val osRows = orders.sortBy { case (ok, ck) => (md5s(ck), ok) }
      .take(1000)
    // coordination: every sampled order's customer is in the customer
    // sample whenever that custkey ranks inside the customer bottom-k —
    // with a shared key domain the overlap must be near-total
    val matched = osRows.count { case (_, ck) => csKeys(ck) }
    assert(matched.toDouble / osRows.length > 0.9,
      s"coordinated overlap $matched/${osRows.length}")
    // the op's NULL segment row (orders whose customer fell outside the
    // sample) accounts for exactly the unmatched remainder
    val nullRow = got.find(_._1.isEmpty)
    val unmatched = osRows.length - matched
    assert(nullRow.map(_._2.toInt).getOrElse(0) == unmatched)
    assert(got.map(_._2).sum == osRows.length.toLong,
      "all sampled orders accounted for")
    // counts per segment match the replay
    val segs = T(spark, TestSpark.Sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val want = osRows.groupBy { case (_, ck) =>
      if (csKeys(ck)) Some(segs(ck)) else None
    }.view.mapValues(_.length.toLong).toMap
    got.foreach { case (seg, n, _) =>
      assert(want.getOrElse(seg, 0L) == n, s"segment $seg count")
    }
  }
}
