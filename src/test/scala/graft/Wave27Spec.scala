package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-27 semantics: SQL-defined functions, identifier templating,
  * Wilson intervals. */
class Wave27Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("udf_sql_scalar: the SQL function inlines (no JVM UDF in the " +
      "plan) and equals the direct expression") {
    val df = SparkEntry.queries("udf_sql_scalar")(spark, TestSpark.Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"SQL UDF must inline, not call out:\n$plan")
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = T(spark, TestSpark.Sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")) * 100).cast("long")) / 100).as("net"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("udf_sql_table: bucket partition conserves the in-range orders " +
      "and keeps empty buckets") {
    val got = SparkEntry.queries("udf_sql_table")(spark, TestSpark.Sf)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.map(_._1).toSeq == (0 until 6), "all 6 buckets present")
    val inRange = T(spark, TestSpark.Sf, "orders")
      .filter(col("o_totalprice") >= 0 && col("o_totalprice") < 600000)
      .count()
    assert(got.map(_._2).sum == inRange, "every in-range order lands once")
  }

  test("sql_lateral_alias: later aliases see earlier ones") {
    val got = SparkEntry.queries("sql_lateral_alias")(spark, TestSpark.Sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) / 100000, "bucket from cents")
      assert(r.getLong(3) == r.getLong(2) * 2, "chained alias")
    }
  }

  test("sql_identifier_clause: resolves the parameter as a name and " +
      "REJECTS sql-injection-shaped arguments") {
    val got = SparkEntry.queries("sql_identifier_clause")(
      spark, TestSpark.Sf).collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.map(_._2).sum == 25, "all 25 nations counted")
    intercept[Exception] {
      spark.sql("SELECT count(*) FROM IDENTIFIER(:tbl)",
        Map("tbl" -> "nation WHERE 1=0; DROP TABLE x")).collect()
    }
  }

  test("stats_wilson_ci: interval brackets the point estimate, stays " +
      "in [0,1], and matches the closed form") {
    val got = SparkEntry.queries("stats_wilson_ci")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.length == 5)
    got.foreach { case (prio, n, k, mid, lo, hi) =>
      val p = k.toDouble / n
      assert(lo >= 0.0 && hi <= 1.0, s"$prio in [0,1]")
      assert(lo <= p + 1e-9 && p <= hi + 1e-9, s"$prio brackets p-hat")
      assert(lo < mid && mid < hi, s"$prio ordered")
      val nn = n.toDouble
      val denom = 1.0 + 4.0 / nn
      val center = (p + 2.0 / nn) / denom
      assert(math.abs(mid - math.round(center * 1e6) / 1e6) < 1e-12,
        s"$prio midpoint closed form")
    }
  }
}
