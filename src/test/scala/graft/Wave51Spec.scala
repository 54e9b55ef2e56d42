package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 51: one-pass training primitives. */
class Wave51Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("ml_ols_normal_eq: fit matches a local QR-free normal-equation " +
      "solve from raw rows, and r2 is in (0, 1]") {
    val r = SparkEntry.queries("ml_ols_normal_eq")(
      spark, TestSpark.Sf).collect().head
    val r2 = r.getAs[Double]("r2")
    assert(r2 > 0 && r2 <= 1)
    // local reference solve on the same rows
    import org.apache.spark.sql.functions._
    val li = T(spark, TestSpark.Sf, "lineitem")
      .groupBy(col("l_orderkey").as("okey"))
      .agg(count(lit(1)).as("x1"), sum(col("l_quantity").cast("long")).as("x2"))
    val rows = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey").as("okey"),
        round(col("o_totalprice")).cast("long").as("y"))
      .join(li, Seq("okey"))
      .collect().map(x => (x.getAs[Long]("x1").toDouble,
        x.getAs[Long]("x2").toDouble, x.getAs[Long]("y").toDouble))
    val n = rows.length.toDouble
    val sx1 = rows.map(_._1).sum; val sx2 = rows.map(_._2).sum
    val sx11 = rows.map(r => r._1 * r._1).sum
    val sx12 = rows.map(r => r._1 * r._2).sum
    val sx22 = rows.map(r => r._2 * r._2).sum
    val sy = rows.map(_._3).sum
    val sx1y = rows.map(r => r._1 * r._3).sum
    val sx2y = rows.map(r => r._2 * r._3).sum
    val det = n * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
    val d1 = n * (sx1y * sx22 - sx12 * sx2y) -
      sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2)
    assert(math.abs(r.getAs[Double]("beta1") - d1 / det) < 1e-3)
  }

  test("ml_naive_bayes: holdout accuracy clearly beats the coin-flip " +
      "floor for both classes (label is token-derived, so learnable)") {
    val rows = SparkEntry.queries("ml_naive_bayes")(
      spark, TestSpark.Sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_test"))
      assert(acc > 0.55,
        s"label ${r.getAs[String]("label")} acc $acc <= 0.55")
    }
  }

  test("ml_kfold_stratified: every lang has 5 folds, fold sizes within " +
      "each lang differ by at most 1, shares sum to 1 per lang") {
    val rows = SparkEntry.queries("ml_kfold_stratified")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("fold"),
        r.getAs[Long]("n"), r.getAs[Double]("share")))
    rows.groupBy(_._1).foreach { case (_, fs) =>
      assert(fs.map(_._2).sorted.toSeq == (0L to 4L))
      val ns = fs.map(_._3)
      assert(ns.max - ns.min <= 1)
      assert(math.abs(fs.map(_._4).sum - 1.0) < 1e-4)
    }
  }

  test("ml_feature_hash_audit: bucket accounting is consistent and " +
      "bounded by the 256-bucket space") {
    val r = SparkEntry.queries("ml_feature_hash_audit")(
      spark, TestSpark.Sf).collect().head
    val v = r.getAs[Long]("n_tokens"); val b = r.getAs[Long]("n_buckets")
    assert(b <= 256 && b <= v)
    assert(r.getAs[Long]("max_load") >= (v + 255) / 256)
    val rate = r.getAs[Double]("collision_rate")
    assert(rate >= 0 && rate <= 1)
    // vocabulary count matches a direct distinct-token count
    import org.apache.spark.sql.functions._
    val direct = T(spark, TestSpark.Sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct().count()
    assert(v == direct)
  }
}
