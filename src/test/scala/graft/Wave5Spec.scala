package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-5 operators: invariants the row-level oracles don't state. */
class Wave5Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("graph_pagerank: ranks form a probability vector, hubs dominate") {
    val rows = SparkEntry.queries("graph_pagerank")(spark, TestSpark.Sf)
      .collect()
    val ranks = rows.map(r => r.getAs[String]("node") ->
      r.getAs[Long]("rank_e12")).toMap
    // quantized per-node at 1e12: total mass stays 1 within n ulps
    val total = ranks.values.sum
    assert(math.abs(total - 1000000000000L) <= ranks.size,
      s"rank mass drifted: $total")
    assert(ranks.values.forall(_ > 0))
    // type nodes aggregate many users' mass: the max type node must
    // outrank the max user node (bipartite hub structure)
    val (types, users) = ranks.partition(_._1.startsWith("t:"))
    assert(types.values.max > users.values.max)
  }

  test("join_fuzzy_levenshtein equals the unblocked brute force") {
    val got = SparkEntry.queries("join_fuzzy_levenshtein")(
      spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("blk") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_d1"))).toMap
    val names = T(spark, TestSpark.Sf, "customer")
      .select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = scala.collection.mutable.Map[Long, (Long, Long)]()
    for {
      (ka, na) <- names
      (kb, nb) <- names if ka < kb && ka / 100 == kb / 100
    } {
      val d = lev(na, nb)
      if (d <= 2) {
        val blk = ka / 100
        val (p, d1) = brute.getOrElse(blk, (0L, 0L))
        brute(blk) = (p + 1, d1 + (if (d == 1) 1 else 0))
      }
    }
    assert(got == brute.toMap)
  }

  test("text_dup_spans equals the in-memory brute force") {
    val docs = T(spark, TestSpark.Sf, "documents")
      .filter(col("lang") === "en")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
      .filter(_._2.length >= 8)
    val perDoc = docs.map { case (id, toks) =>
      id -> toks.sliding(8).map(_.mkString(" ")).toSet
    }.toMap
    val docsPerShingle = perDoc.toSeq
      .flatMap { case (id, shs) => shs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val got = SparkEntry.queries("text_dup_spans")(spark, TestSpark.Sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_dup"))).toMap
    val brute = perDoc.map { case (id, shs) =>
      id -> (shs.size.toLong, shs.count(docsPerShingle(_) >= 2).toLong)
    }
    assert(got == brute)
    assert(brute.values.exists(_._2 > 0),
      "fixture must contain at least one cross-doc duplicated span")
  }

  test("stream_available_now: second run processes only the arrivals") {
    import org.apache.spark.sql.streaming.Trigger
    val src = Tmp.dir("w5_incr_src")
    val out = Tmp.dir("w5_incr_out")
    val ckpt = Tmp.dir("w5_incr_ckpt")
    val ev = T(spark, TestSpark.Sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val total = ev.count()
    val half = ev.filter(col("event_id") % 2 === 0).count()
    def runOnce(): Unit = {
      val q = spark.readStream.schema(ev.schema).parquet(src)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() == half)
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    runOnce()
    val after = spark.read.parquet(out)
    assert(after.count() == total)
    assert(after.select("event_id").distinct().count() == total,
      "restart from checkpoint must not reprocess run-1 files")
  }
}
