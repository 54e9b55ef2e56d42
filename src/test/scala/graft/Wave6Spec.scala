package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-6 operators: conservation laws and cross-op consistency. */
class Wave6Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("data_kanon_suppress conserves rows and suppresses only small groups") {
    val rows = SparkEntry.queries("data_kanon_suppress")(
      spark, TestSpark.Sf).collect()
    val total = T(spark, TestSpark.Sf, "events").count()
    assert(rows.map(r => r.getAs[Long]("n_retained") +
      r.getAs[Long]("n_suppressed")).sum == total,
      "every event is either retained or suppressed")
    // suppressed mass of a type is bounded by 4 rows per small group
    rows.foreach { r =>
      assert(r.getAs[Long]("n_suppressed") <=
        4 * r.getAs[Long]("n_small_groups"))
    }
  }

  test("events_user_journey counts conserve the per-user trigram total") {
    // the top-20 can't be checked alone; rebuild the full path counts and
    // check the conservation law + that the op's rows match the rebuild
    val perUser = T(spark, TestSpark.Sf, "events")
      .groupBy("user_id").count().collect()
      .map(r => math.max(0L, r.getLong(1) - 2)).sum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val full = T(spark, TestSpark.Sf, "events")
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat(col("event_type"), lit(">"), col("e2"), lit(">"),
        col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
    assert(full.agg(sum("n")).collect()(0).getLong(0) == perUser)
    val got = SparkEntry.queries("events_user_journey")(
      spark, TestSpark.Sf).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n"))
    val expect = full.collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n"))
      .sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == expect.toSeq)
  }

  test("text_containment equals the in-memory brute force") {
    val docs = T(spark, TestSpark.Sf, "documents")
      .filter(col("lang") === "en" && col("source").isin("src0", "src1"))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet)
    val brute = (for {
      (ida, ta) <- docs
      (idb, tb) <- docs
      if ida != idb &&
        (ta.size < tb.size || (ta.size == tb.size && ida < idb))
      cont = math.round(ta.count(tb).toDouble / ta.size * 1e6) / 1e6
      if cont >= 0.9
    } yield (ida, idb)).toSet
    val got = SparkEntry.queries("text_containment")(spark, TestSpark.Sf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    assert(got == brute)
    assert(brute.nonEmpty)
  }

  test("text_bigram_xent equals the in-memory brute force") {
    val texts = T(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
    val vocab = texts.flatMap(_._2).distinct.length
    val bigrams = texts.filter(_._2.length >= 2).map { case (id, ts) =>
      id -> ts.sliding(2).map(a => (a(0), a(1))).toSeq
    }
    val cuv = bigrams.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val cu = bigrams.flatMap(_._2.map(_._1)).groupBy(identity)
      .view.mapValues(_.size)
    val brute = bigrams.map { case (id, bs) =>
      // mirror davg's integer-quantized mean exactly
      val s = bs.map { b =>
        val p = (cuv(b) + 0.5) / (cu(b._1) + 0.5 * vocab)
        math.round(-math.log(p) * 1e8)
      }.sum
      id -> (bs.size.toLong,
        math.round(s.toDouble / bs.size / 1e2) / 1e6)
    }.toMap
    val got = SparkEntry.queries("text_bigram_xent")(spark, TestSpark.Sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("xent"))).toMap
    assert(got.keySet == brute.keySet)
    got.foreach { case (id, (n, x)) =>
      assert(n == brute(id)._1, s"doc $id bigram count")
      assert(math.abs(x - brute(id)._2) < 1e-9, s"doc $id xent")
    }
  }

  test("vec_knn_join agrees with vec_knn_query on the shared query") {
    val single = SparkEntry.queries("vec_knn_query")(spark, TestSpark.Sf)
      .collect().take(3)
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim")))
    val batch = SparkEntry.queries("vec_knn_join")(spark, TestSpark.Sf)
      .filter(col("q_id") === 0).orderBy("rk").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim")))
    assert(batch.toSeq == single.toSeq)
  }
}
