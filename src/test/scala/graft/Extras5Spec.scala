package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave-5 operators: bitmap distinct exactness, SCD2 interval algebra,
  * running-distinct equivalence, mask classification.
  */
class Extras5Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("agg_bitmap_distinct equals exact count(DISTINCT user_id)") {
    val bitmap = SparkEntry.queries("agg_bitmap_distinct")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = T(spark, TestSpark.Sf, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bitmap == exact)
  }

  test("dim_scd2: versions chain — valid_to equals next valid_from; one current per user") {
    val rows = SparkEntry.queries("dim_scd2")(spark, TestSpark.Sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getLong(2)) // version
      // versions are 1..n dense
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq)
      // exactly one current row, and it is the last version
      assert(sorted.count(_.getBoolean(5)) == 1)
      assert(sorted.last.getBoolean(5))
      // intervals chain: valid_to(v) == valid_from(v+1), no gaps/overlap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val from = a.getAs[java.time.LocalDateTime](3)
          val to = a.getAs[java.time.LocalDateTime](4)
          assert(!from.isAfter(to))
          assert(to == b.getAs[java.time.LocalDateTime](3), s"$a -> $b")
        case _ => ()
      }
      // consecutive versions change state
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(1) != b.getString(1))
        case _ => ()
      }
    }
  }

  test("win_distinct_running: final value per user equals exact distinct count") {
    val runs = SparkEntry.queries("win_distinct_running")(spark, TestSpark.Sf)
    // last row per user (max event_id per user carries the full-set size
    // only if it is also last in (ts, event_id) order — take max n_types
    // instead, which for a growing frame IS the final value)
    val finals = runs.groupBy("user_id")
      .agg(max("n_types").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = T(spark, TestSpark.Sf, "events")
      .groupBy("user_id").agg(countDistinct("event_type").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finals == exact)
  }

  test("fn_mask: masked outputs preserve length and only substitute classes") {
    SparkEntry.queries("fn_mask")(spark, TestSpark.Sf).collect().take(50)
      .foreach { r =>
        val dflt = r.getString(1)
        assert(dflt.forall(c => c == 'X' || c == 'x' || c == 'n' ||
          !c.isLetterOrDigit), dflt)
      }
  }

  test("vec_hof_dot_rewrite: optimizer rule swaps the HOF idiom for fvdot") {
    val df = SparkEntry.queries("vec_hof_dot_rewrite")(spark, TestSpark.Sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("fvdot"), opt)
    assert(!opt.toLowerCase.contains("zip_with"), opt)
  }

  test("vec_hof_dot_rewrite: results identical to the explicit-fvdot twin") {
    val hof = SparkEntry.queries("vec_hof_dot_rewrite")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val native = SparkEntry.queries("vec_knn_query")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    assert(hof == native)
  }

  test("fvdot replicates HOF null semantics (length mismatch, null element)") {
    import spark.implicits._
    graft.functions.VecExprs.register(spark)
    val df = Seq(
      (Seq(1f, 2f), Seq(3f, 4f)), // clean: 11.0
      (Seq(1f, 2f), Seq(3f)) // length mismatch: NULL
    ).toDF("a", "b")
    val hofExpr = "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * " +
      "CAST(y AS DOUBLE)), 0D, (s, x) -> s + x)"
    val rows = df.selectExpr("fvdot(a, b) AS nat", s"$hofExpr AS hof")
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("agg_count_distinct_multi plans one Expand-based aggregate") {
    val p = SparkEntry.queries("agg_count_distinct_multi")(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), p)
  }

  test("join_null_safe stays a hash join (null-safe equality is hashable)") {
    val p = SparkEntry.queries("join_null_safe")(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    // the NULL key group actually joined
    val rows = SparkEntry.queries("join_null_safe")(spark, TestSpark.Sf)
      .collect()
    assert(rows.exists(_.isNullAt(0)), rows.mkString(";"))
  }

  test("data_upsert_merge: action counts reconcile with base and updates") {
    val m = SparkEntry.queries("data_upsert_merge")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nBase = T(spark, TestSpark.Sf, "documents").count()
    val nUpd = nBase / 10 + math.min(50, nBase) // every 10th (ids dense from 0) + 50 new
    assert(m("keep") + m("update") == nBase)
    assert(m("insert") == 50)
    assert(m("update") + m("insert") == nUpd)
  }

  test("sink_sorted_stats: sorted-layout slice equals direct filter on source") {
    val viaSink = SparkEntry.queries("sink_sorted_stats")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val direct = T(spark, TestSpark.Sf, "lineitem")
      .filter(col("l_shipdate").between("1996-01-01", "1996-03-31"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice"), 2).as("rev"))
      .orderBy("l_returnflag")
      .collect().map(_.toSeq).toSeq
    assert(viaSink == direct)
  }
}
