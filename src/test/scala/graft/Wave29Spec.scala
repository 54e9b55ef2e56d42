package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-29 semantics vs in-memory recomputes. */
class Wave29Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("sql_exec_immediate: parameter binding equals the inlined filter " +
      "and rejects injection-shaped payloads as data") {
    val got = SparkEntry.queries("sql_exec_immediate")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = T(spark, TestSpark.Sf, "orders")
      .filter(col("o_totalprice") >= 150000.0 &&
        col("o_orderstatus") === "F")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
    // a quote-breaking payload binds as a plain string literal: no rows
    // match it, and nothing is executed as SQL
    val v = s"ord_inj_${System.nanoTime()}"
    T(spark, TestSpark.Sf, "orders").createOrReplaceTempView(v)
    val inj = spark.sql(
      s"EXECUTE IMMEDIATE 'SELECT count(*) AS n FROM $v " +
        "WHERE o_orderstatus = :st' " +
        "USING '\\' OR 1=1 --' AS st")
      .collect().head.getLong(0)
    assert(inj == 0L, "injection payload must bind as data, not SQL")
  }

  test("data_temperature_mix: α=0.3 flattens the head language and the " +
      "budget allocation sums to ~10k") {
    val got = SparkEntry.queries("data_temperature_mix")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(got.length >= 3)
    val head = got.maxBy(_._1 == "en")
    val en = got.find(_._1 == "en").get
    // temperature sampling shrinks the dominant language's share and
    // raises every minority language's share
    assert(en._3 > en._4, "en: p_temp < p_raw")
    got.filter(_._1 != "en").foreach { l =>
      assert(l._4 > l._3, s"${l._1}: p_temp > p_raw")
    }
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-4, "p_temp sums to 1")
    assert(math.abs(got.map(_._5).sum - 10000L) <= got.length,
      "budget rows sum to ~10k up to per-row rounding")
    // upsample factor consistency: budget ≈ factor * n_docs
    got.foreach { l =>
      assert(math.abs(l._6 - l._5.toDouble / l._2) < 0.01, s"${l._1} factor")
    }
  }

  test("text_gopher_rules: funnel counts match a pure-Scala replay") {
    val got = SparkEntry.queries("text_gopher_rules")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val stops = Set("the", "a", "of", "and", "to")
    val want = T(spark, TestSpark.Sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (src, ds) =>
        val rules = ds.map { case (_, t) =>
          val words = t.split(" ", -1)
          val wc = words.length
          val mwl = (t.length - (wc - 1)).toDouble / wc
          val uniq = words.distinct
          (wc >= 50 && wc <= 100000, mwl >= 3 && mwl <= 10,
            uniq.count(stops) >= 2, uniq.length.toDouble / wc > 0.3)
        }
        (src, rules.length.toLong,
          rules.count(_._1).toLong, rules.count(_._2).toLong,
          rules.count(_._3).toLong, rules.count(_._4).toLong,
          rules.count(r => r._1 && r._2 && r._3 && r._4).toLong)
      }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    // the gates discriminate on this corpus: some docs fail, some pass
    assert(got.map(_._7).sum > 0, "some docs pass all gates")
    assert(got.map(_._7).sum < got.map(_._2).sum, "some docs fail a gate")
  }

  test("vec_hamming_knn: sign-sketch Hamming top-10 matches a brute-force " +
      "replay and correlates with cosine neighbors") {
    val got = SparkEntry.queries("vec_hamming_knn")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val embs = T(spark, TestSpark.Sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def sig(e: Array[Float]): Long =
      (0 until 62).foldLeft(0L)((acc, i) =>
        if (e(i) > 0f) acc | (1L << i) else acc)
    val sigs = embs.map { case (id, e) => (id, sig(e)) }
    val want = sigs.filter(_._1 < 8).flatMap { case (qid, qs) =>
      sigs.filter(_._1 != qid)
        .map { case (id, sg) =>
          (id, java.lang.Long.bitCount(sg ^ qs).toLong)
        }
        .sortBy { case (id, d) => (d, id) }.take(10).zipWithIndex
        .map { case ((id, d), i) => (qid, i + 1L, id, d) }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
    // ANN sanity: the Hamming top-10 of query 0 overlaps the exact
    // cosine top-10 (sign sketches preserve angular neighborhoods)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val q0 = embs.find(_._1 == 0L).get._2
    val cosTop = embs.filter(_._1 != 0L)
      .map { case (id, e) => (id, cos(q0, e)) }
      .sortBy(c => (-c._2, c._1)).take(10).map(_._1).toSet
    val hamTop = got.filter(_._1 == 0L).map(_._3).toSet
    assert((cosTop & hamTop).nonEmpty,
      "Hamming neighborhood intersects the cosine neighborhood")
  }
}
