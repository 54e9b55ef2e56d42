package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared operator runs on sf0.001, and its schema obeys the
  * determinism contract prerequisites (no duplicate column names, every
  * oracle query has a matching queries entry).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("oracleSql keys are a subset of queries keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracle entries: ${o.diff(q)}")
  }

  test("declared inventory covers every SURVEY §2 category") {
    val names = SparkEntry.queries.keySet
    val prefixes = Seq("scan_", "join_", "agg_", "win_", "fn_", "stream_",
      "text_", "vec_", "rc_", "udf_", "udaf_", "udtf_", "ts_", "mm_")
    prefixes.foreach { p =>
      assert(names.exists(_.startsWith(p)), s"no operator in category $p")
    }
  }

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.fn(spark, TestSpark.Sf)
      val cols = df.columns
      assert(cols.distinct.length == cols.length,
        s"duplicate output columns: ${cols.mkString(",")}")
      val n = df.count()
      assert(n >= 0)
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
