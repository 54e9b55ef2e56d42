package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-operator algebraic invariants (SURVEY §5.4) — different operator
  * formulations must agree on the same data.
  */
class InvariantSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("running window sum ends at the groupBy total per customer") {
    val lastRunning = SparkEntry.queries("win_running_sum")(spark, sf)
      .groupBy("o_custkey").agg(max("running_rev").as("total"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val grouped = T(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg((sum(round(col("o_totalprice") * 100).cast("long")) / 100.0)
        .as("total"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(lastRunning == grouped)
  }

  test("intersect + except partition the distinct key space") {
    val all = T(spark, sf, "orders").select("o_custkey").distinct()
    val f = T(spark, sf, "orders").filter(col("o_orderstatus") === "F")
      .select("o_custkey")
    val inter = all.intersect(f).count()
    val exc = all.except(f).count()
    assert(inter + exc == all.count())
  }

  test("salted aggregation equals plain aggregation") {
    val salted = SparkEntry.queries("agg_salted")(spark, sf)
      .collect().map(_.toSeq)
    val plain = T(spark, sf, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0)
          .as("sum_val"))
      .orderBy("event_type")
      .collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("bucketed range join equals the nested-loop theta join") {
    val a = SparkEntry.queries("join_theta_range")(spark, sf)
      .collect().map(_.toSeq)
    val b = SparkEntry.queries("join_range_bucketed")(spark, sf)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("byte-exact dups are a subset of content-fingerprint dups") {
    // text_dedup_exact counts byte-identical texts; text_dedup_groups
    // groups by sorted-token-set fingerprint, which can only merge MORE
    val exact = SparkEntry.queries("text_dedup_exact")(spark, sf)
      .agg(sum("n_dups")).collect()(0).getLong(0)
    val fp = SparkEntry.queries("text_dedup_groups")(spark, sf)
      .agg(coalesce(sum(col("n_copies") - 1), lit(0L))).collect()(0)
      .getLong(0)
    assert(exact <= fp)
  }

  test("seeded sample is deterministic and near the target fraction") {
    val a = SparkEntry.queries("sample_seeded")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val b = SparkEntry.queries("sample_seeded")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "seeded sample not deterministic")
    val total = T(spark, sf, "documents").count().toDouble
    val frac = a.length / total
    assert(frac > 0.05 && frac < 0.15, s"fraction $frac far from 0.1")
  }

  test("approx distinct is within 5% of exact distinct") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = T(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs $e")
    }
  }
}
