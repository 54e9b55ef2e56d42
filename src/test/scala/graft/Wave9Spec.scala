package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-9 operators: referential integrity under tokenization, CUSUM
  * argmax vs brute force, audit counts vs direct queries.
  */
class Wave9Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("data_pseudonymize: tokenized join equals the raw-key join") {
    val raw = T(spark, TestSpark.Sf, "events")
      .join(T(spark, TestSpark.Sf, "customer"),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val got = SparkEntry.queries("data_pseudonymize")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_users"))).toMap
    assert(got == raw, "pseudonyms must preserve the join exactly")
    // and no output column carries a raw key
    val cols = SparkEntry.queries("data_pseudonymize")(
      spark, TestSpark.Sf).columns.toSet
    assert(!cols.contains("user_id") && !cols.contains("c_custkey"))
  }

  test("ts_changepoint_cusum equals the per-type brute force") {
    val daily = T(spark, TestSpark.Sf, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .count().collect()
      .map(r => (r.getString(0),
        r.getAs[Any]("d") match {
          case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
          case t: java.time.LocalDateTime => t.toLocalDate
        },
        r.getLong(2)))
      .groupBy(_._1)
    val brute = daily.map { case (t, rows) =>
      val series = rows.map(r => (r._2, r._3)).sortBy(_._1.toEpochDay)
      val n = series.size.toLong
      val s = series.map(_._2).sum
      var run = 0L
      val devs = series.zipWithIndex.map { case ((day, c), i) =>
        run += c
        (day, math.abs(run * n - (i + 1) * s))
      }
      val best = devs.maxBy(x => (x._2, -x._1.toEpochDay))
      t -> best
    }
    val got = SparkEntry.queries("ts_changepoint_cusum")(
      spark, TestSpark.Sf).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[java.sql.Date]("cp_day").toLocalDate),
          r.getAs[Long]("dev_scaled"))).toMap
    brute.foreach { case (t, (day, dev)) =>
      assert(got(t) == ((day, dev)), s"$t: ${got(t)} vs ($day, $dev)")
    }
  }

  test("data_quality_rules: clean fixture, referential rule cross-checked") {
    val r = SparkEntry.queries("data_quality_rules")(spark, TestSpark.Sf)
      .collect()(0)
    assert(r.getAs[Long]("n_rows") ==
      T(spark, TestSpark.Sf, "orders").count())
    val orphan = T(spark, TestSpark.Sf, "orders")
      .join(T(spark, TestSpark.Sf, "customer"),
        col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(r.getAs[Long]("viol_custkey_known") == orphan)
    assert(r.getAs[Long]("viol_price_positive") == 0)
    assert(r.getAs[Long]("viol_status_in_set") == 0)
  }
}
