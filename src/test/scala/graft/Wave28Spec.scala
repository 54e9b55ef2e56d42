package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-28 semantics vs in-memory recomputes. */
class Wave28Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("ts_stl_decompose: y = trend + seasonal + resid (to rounding), " +
      "trend matches a sequential centered average") {
    val got = SparkEntry.queries("ts_stl_decompose")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length > 100, "a month of hourly rows")
    got.foreach { case (h, y, t, s, res) =>
      assert(math.abs(y - (t + s + res)) < 2e-4, s"$h reconstructs")
    }
    // sequential recompute of the trend at a mid-series hour
    val hourly = T(spark, TestSpark.Sf, "events")
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))
        .cast("timestamp")) / 3600L).cast("long").as("hb"))
      .agg(sum(round(col("value") * 100).cast("long")).as("yc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mid = hourly.keys.toSeq.sorted.apply(hourly.size / 2)
    val window = (mid - 12 to mid + 12).flatMap(hourly.get)
    val trend = window.sum.toDouble / window.length / 100
    val gotMid = got(got.map(_._1).indexOf(
      java.time.LocalDateTime.ofEpochSecond(mid * 3600, 0,
        java.time.ZoneOffset.UTC)))
    assert(math.abs(gotMid._3 - math.round(trend * 1e4) / 1e4) < 1e-9,
      "trend at the mid hour")
    // seasonal must sum to ~0 across a day's profile (mean-centered
    // detrended means), within edge-effect tolerance
    val prof = got.groupBy(_._1.getHour).map(_._2.head._4)
    assert(math.abs(prof.sum / prof.size) < 1.0,
      "seasonal profile is near mean-zero")
  }

  test("data_dedup_canonical: keeps the LONGEST copy per fingerprint " +
      "and conserves counts") {
    val got = SparkEntry.queries("data_dedup_canonical")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    val docs = T(spark, TestSpark.Sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byFp = docs.groupBy { case (_, _, t) =>
      t.split(" ").distinct.sorted.mkString(" ")
    }
    val keepers = byFp.values.map(g =>
      g.minBy(d => (-d._3.length.toLong, d._1))).map(_._1).toSet
    val want = docs.groupBy(_._2).map { case (lang, ds) =>
      val kept = ds.filter(d => keepers(d._1))
      (lang, ds.length.toLong, kept.length.toLong,
        kept.map(_._3.length.toLong).sum,
        ds.filterNot(d => keepers(d._1)).map(_._3.length.toLong).sum)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.map(_._2).sum > got.map(_._3).sum,
      "token-set duplicates exist, so canonicalization drops something")
  }

  test("sql_cache_table: plans through InMemoryRelation and equals the " +
      "uncached aggregate") {
    val got = SparkEntry.queries("sql_cache_table")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = T(spark, TestSpark.Sf, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100)
          .as("total"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("vec_rerank_mmr: greedy selection matches a pure-Scala replay " +
      "and diversifies vs plain top-k") {
    val got = SparkEntry.queries("vec_rerank_mmr")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val embs = T(spark, TestSpark.Sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val byId = embs.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    val queries = embs.filter(_._1 < 8).toMap
    val want = queries.toSeq.flatMap { case (qid, q) =>
      val cand = embs.filter(_._1 != qid)
        .map { case (id, e) => (id, e, cos(q, e)) }
        .sortBy(c => (-c._3, c._1)).take(20)
      val sel = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Array[Double], Double)]
      while (sel.length < 5 && sel.length < cand.length) {
        val pick = cand.filterNot(c => sel.exists(_._1 == c._1))
          .maxBy { c =>
            val div = if (sel.isEmpty) 0.0
              else sel.map(sc => cos(c._2, sc._2)).max
            (0.7 * c._3 - 0.3 * div, -c._1.toDouble)
          }
        sel += ((pick._1, pick._2, pick._3))
      }
      sel.zipWithIndex.map { case ((id, _, rel), rank) =>
        (qid, rank.toLong, id,
          BigDecimal(rel).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want)
    // diversity: for at least one query the MMR pick order differs from
    // plain cosine order (otherwise the diversity term did nothing here)
    val plainTop5 = queries.toSeq.map { case (qid, q) =>
      qid -> embs.filter(_._1 != qid)
        .map { case (id, e) => (id, cos(q, e)) }
        .sortBy(c => (-c._2, c._1)).take(5).map(_._1).toSeq
    }.toMap
    val mmrOrder = got.groupBy(_._1).map { case (q, rs) =>
      q -> rs.sortBy(_._2).map(_._3).toSeq
    }
    assert(mmrOrder.exists { case (q, order) => order != plainTop5(q) },
      "MMR must reorder at least one query's ranking")
  }
}
