package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-4 operators: recursive date spine, bucketed interval-overlap join
  * (vs its theta-join definition), CEP pattern matching, PII scrubbing,
  * cross-lingual near-dup, exact-at-fixture HLL partials.
  */
class Round4Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("sql_recursive_cte: contiguous month spine, counts total to orders") {
    val rows = SparkEntry.queries("sql_recursive_cte")(spark, TestSpark.Sf)
      .collect()
    val months = rows.map(_.getAs[java.sql.Date]("month_start").toLocalDate)
    // contiguous: every consecutive pair is exactly one month apart
    months.sliding(2).foreach { case Array(a, b) =>
      assert(a.plusMonths(1) == b, s"$a -> $b")
    }
    val totalOrders = T(spark, TestSpark.Sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == totalOrders)
  }

  test("join_interval_overlap equals the direct theta join") {
    val bucketed = SparkEntry.queries("join_interval_overlap")(
      spark, TestSpark.Sf).collect().map(_.toSeq).toSeq
    val iv = 1800L * 1000000L
    val e = T(spark, TestSpark.Sf, "events")
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("su"))
      .withColumn("eu", col("su") + iv)
    val a = e.filter(col("event_type") === "view")
      .select(col("event_id").as("a_id"), col("user_id").as("ua"),
        col("su").as("a_s"), col("eu").as("a_e"))
    val b = e.filter(col("event_type") === "click")
      .select(col("event_id").as("b_id"), col("user_id").as("ub"),
        col("su").as("b_s"), col("eu").as("b_e"))
    val theta = a.join(b, col("ua") === col("ub") &&
        col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e"))
          - greatest(col("a_s"), col("b_s"))).as("overlap_us"))
      .orderBy("a_id", "b_id")
      .collect().map(_.toSeq).toSeq
    assert(bucketed == theta)
  }

  test("join_interval_overlap plans an equi-join, not a nested loop") {
    val plan = SparkEntry.queries("join_interval_overlap")(
      spark, TestSpark.Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("events_cep_pattern: click strictly follows view within the window") {
    val iv = 1800L * 1000000L
    val rows = SparkEntry.queries("events_cep_pattern")(spark, TestSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gap = r.getAs[Long]("gap_us")
      assert(gap >= 0 && gap <= iv, r.toString)
    }
    // the matched ids really are a view and a click of that user
    val ev = T(spark, TestSpark.Sf, "events")
      .select("event_id", "user_id", "event_type").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(ev(r.getAs[Long]("view_id")) == (u, "view"))
      assert(ev(r.getAs[Long]("click_id")) == (u, "click"))
    }
  }

  test("events_cep_kleene: only errors between view and click; quantifier fires") {
    val rows = SparkEntry.queries("events_cep_kleene")(spark, TestSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    // the fixture is calibrated so the (error)* quantifier actually fires
    assert(rows.exists(_.getAs[Long]("n_errors") > 0))
    // reconstruct per-user sequences and check strict semantics
    val seq = T(spark, TestSpark.Sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (u, es) =>
        u -> es.sortBy(e => (e._4, e._2)).map(e => (e._2, e._3)).toVector
      }
    rows.foreach { r =>
      val events = seq(r.getAs[Long]("user_id"))
      val vi = events.indexWhere(_._1 == r.getAs[Long]("view_id"))
      val ci = events.indexWhere(_._1 == r.getAs[Long]("click_id"))
      assert(vi >= 0 && ci > vi, r.toString)
      assert(events(vi)._2 == "view" && events(ci)._2 == "click", r.toString)
      val between = events.slice(vi + 1, ci)
      assert(between.forall(_._2 == "error"), r.toString)
      assert(between.size.toLong == r.getAs[Long]("n_errors"), r.toString)
    }
  }

  test("stream_cep_kleene_live is row-identical to the batch events_cep_kleene") {
    val live = SparkEntry.queries("stream_cep_kleene_live")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("events_cep_kleene")(spark, TestSpark.Sf)
      .select("user_id", "view_id", "click_id", "n_errors", "span_us")
      .orderBy("view_id")
      .collect().map(_.toSeq).toSeq
    assert(live == batch)
  }

  test("stream_cep_timeout_live: reported views really saw no click in window") {
    val iv = 1800L * 1000000L
    val reported = SparkEntry.queries("stream_cep_timeout_live")(
      spark, TestSpark.Sf).collect()
    assert(reported.nonEmpty)
    val ev = T(spark, TestSpark.Sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicksByUser = ev.filter(_._3 == "click")
      .groupBy(_._1).map { case (u, cs) => u -> cs.map(_._4) }
    val viewTs = ev.filter(_._3 == "view")
      .map(e => e._2 -> e._4).toMap
    val wmMs = ev.map(_._4).max / 1000 - 600000
    reported.foreach { r =>
      val vts = viewTs(r.getAs[Long]("view_id"))
      assert(r.getAs[Long]("deadline_ms") == (vts + iv) / 1000, r.toString)
      assert(r.getAs[Long]("deadline_ms") <= wmMs, r.toString)
      val clicked = clicksByUser.getOrElse(r.getAs[Long]("user_id"), Array[Long]())
        .exists(c => c > vts && c <= vts + iv)
      assert(!clicked, r.toString)
    }
  }

  test("text_pii_scrub removes every synthesized PII span") {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val phone = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}".r
    val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}".r
    val counts = SparkEntry.queries("text_pii_scrub")(spark, TestSpark.Sf)
      .collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      assert(r.getAs[Long]("n_email") >= 1, r.toString)
      assert(r.getAs[Long]("n_phone") >= 1, r.toString)
      assert(r.getAs[Long]("n_ip") >= 1, r.toString)
    }
    // re-derive one scrubbed text locally and confirm nothing survives
    val doc = T(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").orderBy("doc_id").first()
    val raw = doc.getString(1) + " contact user" + doc.getLong(0) +
      "@mail.example.com or +1-555-" +
      f"${doc.getLong(0) % 10000}%04d" +
      " from 10." + (doc.getLong(0) % 200) + ".0.1"
    val scrubbed = ip.replaceAllIn(
      phone.replaceAllIn(
        email.replaceAllIn(raw, "<EMAIL>"), "<PHONE>"), "<IP>")
    assert(email.findFirstIn(scrubbed).isEmpty)
    assert(phone.findFirstIn(scrubbed).isEmpty)
    assert(ip.findFirstIn(scrubbed).isEmpty)
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>") &&
      scrubbed.contains("<IP>"))
  }

  test("text_dedup_crosslang: every pair crosses languages at jac >= 0.8") {
    val rows = SparkEntry.queries("text_dedup_crosslang")(spark, TestSpark.Sf)
      .collect()
    assert(rows.nonEmpty) // the shared-vocabulary corpus has cross-lang twins
    rows.foreach { r =>
      assert(r.getAs[String]("lang_a") != r.getAs[String]("lang_b"), r.toString)
      assert(r.getAs[Double]("jac") >= 0.8, r.toString)
    }
  }

  test("stream_cep_live is row-identical to the batch events_cep_pattern") {
    val live = SparkEntry.queries("stream_cep_live")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("events_cep_pattern")(spark, TestSpark.Sf)
      .select("user_id", "view_id", "click_id", "gap_us")
      .orderBy("view_id")
      .collect().map(_.toSeq).toSeq
    assert(live == batch)
  }

  test("text_dedup_crosslang_lsh finds exactly the exact baseline's src0 pairs") {
    val srcOf = T(spark, TestSpark.Sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lsh = SparkEntry.queries("text_dedup_crosslang_lsh")(
      spark, TestSpark.Sf).collect()
      .filter(r => srcOf(r.getAs[Long]("doc_a")) == "src0" &&
        srcOf(r.getAs[Long]("doc_b")) == "src0")
      .map(_.toSeq).toSeq
    val exact = SparkEntry.queries("text_dedup_crosslang")(
      spark, TestSpark.Sf).collect().map(_.toSeq).toSeq
    assert(lsh == exact)
  }

  test("CEP pattern and kleene state survive micro-batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingTwins
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val iv = 1800L * 1000000L
    val kl = 6L * 3600L * 1000000L
    // arrival order = event time, as in a real stream; splits land
    // mid-user-sequence so view→click pairs straddle batch boundaries
    val in = T(spark, TestSpark.Sf, "events")
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsUs"),
        col("user_id"), col("event_type"))
      .as[StreamingTwins.CepIn]
      .collect().sortBy(r => (r.tsUs, r.event_id)).toSeq

    def run(twin: org.apache.spark.sql.Dataset[StreamingTwins.CepIn] =>
        org.apache.spark.sql.DataFrame, batches: Seq[Seq[StreamingTwins.CepIn]])
        : Seq[Seq[Any]] = {
      val mem = MemoryStream[StreamingTwins.CepIn]
      val name = s"cep_mb_${System.nanoTime()}"
      val q = twin(mem.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        spark.table(name).collect().map(_.toSeq.toSeq).toSeq
          .sortBy(_.mkString(","))
      } finally q.stop()
    }

    val thirds = Seq(in.take(400), in.slice(400, 800), in.drop(800))
      .filter(_.nonEmpty)
    val p1 = run(d => StreamingTwins.cepPattern(d, iv).toDF(), Seq(in))
    val p3 = run(d => StreamingTwins.cepPattern(d, iv).toDF(), thirds)
    assert(p1.nonEmpty && p1 == p3,
      "cepPattern diverges when state crosses batch boundaries")
    val k1 = run(d => StreamingTwins.cepKleene(d, kl).toDF(), Seq(in))
    val k3 = run(d => StreamingTwins.cepKleene(d, kl).toDF(), thirds)
    assert(k1.nonEmpty && k1 == k3,
      "cepKleene diverges when state crosses batch boundaries")
  }

  test("sink_zorder_layout: the Morton interleave is exact") {
    import spark.implicits._
    // recompute the op's zcode expression over a driver-checked range
    def bit(c: org.apache.spark.sql.Column, i: Int) =
      shiftrightunsigned(c, i).bitwiseAND(lit(1L))
    def mortonCol(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =
      (0 until 8).map { i =>
        shiftleft(bit(a, i), 2 * i)
          .bitwiseOR(shiftleft(bit(b, i), 2 * i + 1))
      }.reduce(_ bitwiseOR _)
    def mortonRef(a: Long, b: Long): Long =
      (0 until 8).map { i =>
        (((a >>> i) & 1L) << (2 * i)) | (((b >>> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val pairs = for (a <- 0L to 255L by 17L; b <- 0L to 255L by 13L)
      yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), mortonCol(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b), s"morton($a,$b)")
    }
    // the classic identities: all-a bits land on even positions, all-b odd
    assert(mortonRef(0xFFL, 0L) == 0x5555L && mortonRef(0L, 0xFFL) == 0xAAAAL)
  }

  test("agg_hll_sketch: sparse-mode estimate is exact at fixture scale") {
    val r = SparkEntry.queries("agg_hll_sketch")(spark, TestSpark.Sf).first()
    assert(r.getAs[Long]("est_total") == r.getAs[Long]("exact_total"))
  }
}
