package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-3 operators: skew-salted join equivalence, chunk-level dedup,
  * mixture upsampling fan-out, deterministic shuffle invariants, LSH
  * near-dup subset/recall, binary source stability.
  */
class Round3Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("join_skew_salted equals the plain unsalted join") {
    val salted = SparkEntry.queries("join_skew_salted")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val plain = T(spark, TestSpark.Sf, "events")
      .join(T(spark, TestSpark.Sf, "customer"),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value"), 2).as("sum_val"))
      .orderBy("c_mktsegment")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("join_skew_salted does NOT plan a broadcast join") {
    val plan = SparkEntry.queries("join_skew_salted")(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("text_chunk_dedup: every reported chunk spans >1 document") {
    val rows = SparkEntry.queries("text_chunk_dedup")(spark, TestSpark.Sf)
      .collect()
    assert(rows.forall(_.getAs[Long]("n_docs") > 1))
  }

  test("text_upsample_mix: rows_out = docs_in x weight per source") {
    SparkEntry.queries("text_upsample_mix")(spark, TestSpark.Sf)
      .collect().foreach { r =>
        val w = if ((0 to 4).map("src" + _).contains(r.getAs[String]("source")))
          3 else 1
        assert(r.getAs[Long]("n_rows_out") ==
          r.getAs[Long]("n_docs_in") * w, r.toString)
      }
  }

  test("data_shuffle_det: complete permutation, contiguous per shard, stable") {
    val a = SparkEntry.queries("data_shuffle_det")(spark, TestSpark.Sf)
      .collect()
    val nDocs = T(spark, TestSpark.Sf, "documents").count()
    assert(a.length == nDocs)
    assert(a.map(_.getAs[Long]("doc_id")).toSet.size == nDocs)
    a.groupBy(_.getAs[String]("shard")).foreach { case (_, rows) =>
      val ps = rows.map(_.getAs[Long]("pos")).sorted
      assert(ps.head == 1L && ps.last == ps.length.toLong) // 1..n contiguous
    }
    val b = SparkEntry.queries("data_shuffle_det")(spark, TestSpark.Sf)
      .collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("vec_dedup_lsh: reported pairs are a subset of the exact pairs") {
    val lsh = SparkEntry.queries("vec_dedup_lsh")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("vec_neardup_cosine")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"phantom pairs: ${lsh.diff(exact)}")
    // documented adversarial-fixture recall ≈ 0.5 (sim 0.4-0.6 pairs);
    // require a meaningful floor, not exactness
    assert(lsh.size >= (exact.size * 0.25).toInt,
      s"recall ${lsh.size}/${exact.size}")
  }

  test("rc_stream_states_tws equals rc_stream_states_live row-for-row") {
    val tws = SparkEntry.queries("rc_stream_states_tws")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val fmg = SparkEntry.queries("rc_stream_states_live")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    assert(tws == fmg)
  }

  test("source_binary: one file, positive length, stable checksum") {
    val a = SparkEntry.queries("source_binary")(spark, TestSpark.Sf).collect()
    assert(a.length == 1)
    assert(a.head.getAs[Long]("length") > 0)
    val b = SparkEntry.queries("source_binary")(spark, TestSpark.Sf).collect()
    assert(a.head.getAs[String]("checksum") ==
      b.head.getAs[String]("checksum"))
  }
}
