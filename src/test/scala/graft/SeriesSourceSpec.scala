package graft

import graft.rc.RcPipeline
import graft.sources.SeriesSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DSv2 generator source: schema, partitioning, determinism,
  * and end-to-end use as RC training input.
  */
class SeriesSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def load(keys: Int, n: Int) =
    spark.read.format("rcseries")
      .option("keys", keys).option("n", n).load()

  test("short name resolves and schema is (key, t, value)") {
    val df = load(3, 10)
    assert(df.columns.toSeq == Seq("key", "t", "value"))
    assert(df.count() == 30)
  }

  test("one input partition per key") {
    assert(load(5, 10).rdd.getNumPartitions == 5)
  }

  test("distributed rows equal the local generator, per key") {
    val got = load(2, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    (0L to 1L).foreach { k =>
      val expected = SeriesSource.generate(k, 50)
      val series = got(k).sortBy(_._2).map(_._3)
      assert(series.sameElements(expected), s"key $k mismatch")
    }
  }

  test("keys produce distinct series (different initial conditions)") {
    val rows = load(2, 100).groupBy("key")
      .agg(sum("value")).collect().map(_.getDouble(1))
    assert(rows(0) != rows(1))
  }

  test("the source feeds RcPipeline end to end") {
    import spark.implicits._
    val series = load(4, 800)
      .select(col("key"), col("t"), lit(0L), col("value"))
      .as[RcPipeline.Sample]
    val model = RcPipeline.fit(series, lambda = 1e-6)
    val mses = RcPipeline.score(series, model).collect()
    assert(mses.length == 4)
    // chaotic but learnable: every key's test MSE is small
    mses.foreach { case (k, _, mse) =>
      assert(mse < 1e-3, s"key $k mse $mse")
    }
  }
}
