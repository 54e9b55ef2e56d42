package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The determinism helpers must produce bit-identical results no matter
  * how Spark partitions the data — that's their whole contract (plain
  * double aggregation is partial-agg-order-dependent).
  */
class DetSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def nonIntegral(i: Int): Double = math.sin(i) * 100.0 + 1.0 / 3

  test("Guard.quadratic passes under the cap and rejects over it") {
    import spark.implicits._
    val small = (1 to 10).toDF("x")
    graft.Guard.quadratic(small, "test-op", cap = 10L) // no throw
    val ex = intercept[IllegalArgumentException] {
      graft.Guard.quadratic((1 to 11).toDF("x"), "test-op", cap = 10L)
    }
    assert(ex.getMessage.contains("test-op"))
    assert(ex.getMessage.contains("scale path"))
  }

  test("davg is partition-layout invariant") {
    import spark.implicits._
    val xs = (1 to 20000).map(i => (i % 7, nonIntegral(i)))
    def agg(df: DataFrame): Seq[org.apache.spark.sql.Row] =
      df.groupBy("k").agg(Det.davg(col("v"), 6).as("a"))
        .orderBy("k").collect().toSeq
    val base = agg(xs.toDF("k", "v").repartition(1))
    assert(agg(xs.toDF("k", "v").repartition(32)) == base)
    assert(agg(xs.toDF("k", "v").repartition(7, col("k"))) == base)
  }

  test("dsum is partition-layout invariant") {
    import spark.implicits._
    val xs = (1 to 20000).map(i => (i % 5, nonIntegral(i)))
    def agg(df: DataFrame): Seq[org.apache.spark.sql.Row] =
      df.groupBy("k").agg(Det.dsum(col("v"), 2).as("s"))
        .orderBy("k").collect().toSeq
    assert(agg(xs.toDF("k", "v").repartition(1)) ==
      agg(xs.toDF("k", "v").repartition(32)))
  }

  test("GeoMean UDAF is partition-layout invariant") {
    import spark.implicits._
    val gm = udaf(graft.ops.UdfOps.GeoMean)
    val xs = (1 to 20000).map(i => (i % 3, (i % 47) + 1.0))
    def agg(df: DataFrame): Seq[org.apache.spark.sql.Row] =
      df.groupBy("k").agg(Det.dround(gm(col("v")), 6).as("g"))
        .orderBy("k").collect().toSeq
    assert(agg(xs.toDF("k", "v").repartition(1)) ==
      agg(xs.toDF("k", "v").repartition(32)))
  }
}
