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

  test("Pack roundtrips pairs incl. the uint32 sign-bit boundary") {
    import spark.implicits._
    // ids >= 2^31 set the packed sign bit — an arithmetic shift would
    // sign-extend and corrupt the left id
    val cases = Seq((0L, 0L), (1L, 2L), (0x7fffffffL, 0x80000000L),
      (0x80000000L, 0xfffffffeL), (0xfffffffeL, 0xffffffffL))
    val got = cases.toDF("a", "b")
      .select(Pack.pair(col("a"), col("b")).as("pk"))
      .select(Pack.left(col("pk")).as("a"), Pack.right(col("pk")).as("b"))
      .as[(Long, Long)].collect().toSeq
    assert(got == cases)
  }

  test("Pack.pair raises on ids outside [0, 2^32) instead of corrupting") {
    import spark.implicits._
    // ADVICE-r11: the 32-bit bound is enforced per row, not a scaladoc
    // promise — an oversize or negative id would otherwise silently
    // merge distinct pairs in the downstream distinct()
    for (bad <- Seq((0x100000000L, 1L), (1L, 0x100000000L), (-1L, 1L))) {
      val e = intercept[Exception] {
        Seq(bad).toDF("a", "b")
          .select(Pack.pair(col("a"), col("b")).as("pk")).collect()
      }
      assert(e.getMessage.contains("Pack.pair"),
        s"$bad: ${e.getMessage}")
    }
  }

  test("join_dpp plans a dynamic-pruning subquery on the fact scan") {
    val plan = SparkEntry.queries("join_dpp")(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(2000))
  }

  test("text_simhash_near equals the brute-force hamming scan (pigeonhole)") {
    val banded = SparkEntry.queries("text_simhash_near")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = T(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        // -1 keeps trailing empty tokens, matching Spark's split()
        graft.text.TextAlgs.simhash(r.getString(1).split(" ", -1).toSeq)))
    val brute = (for {
      (ia, sa) <- hashes; (ib, sb) <- hashes
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
    assert(banded == brute,
      s"missed ${brute.diff(banded)} extra ${banded.diff(brute)}")
    assert(brute.nonEmpty) // fixture has exact dups => hamming-0 pairs
  }

  test("ts_ewma matches a driver-side sequential fold") {
    val got = SparkEntry.queries("ts_ewma")(spark, TestSpark.Sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val rows = T(spark, TestSpark.Sf, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      var ew = sorted.head._4
      sorted.tail.foreach { r => ew = 0.2 * r._4 + 0.8 * ew }
      val (n, e) = got(uid)
      assert(n == rs.length.toLong)
      assert(math.abs(e - ew) < 1e-6, s"user $uid: $e vs $ew")
    }
  }

  test("rc_stream_states_tws equals rc_stream_states_live row-for-row") {
    val tws = SparkEntry.queries("rc_stream_states_tws")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    val fmg = SparkEntry.queries("rc_stream_states_live")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    assert(tws == fmg)
  }

  test("vec_pca_power matches a driver-side quantized power iteration " +
    "bit-for-bit") {
    import graft.ops.PcaQ.rz
    val rows = SparkEntry.queries("vec_pca_power")(spark, TestSpark.Sf)
      .collect()
    assert(rows.length == 8)
    assert(rows.head.getAs[Double]("eigenvalue") > 0)
    // independent sequential reference on the same integer grids — the
    // quantization makes the distributed treeAggregate EXACTLY equal to
    // this loop (associative integer sums), so no tolerance is needed
    val xs = T(spark, TestSpark.Sf, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = 64
    val n = xs.length.toLong
    val msum = new Array[Long](dim)
    xs.foreach { x =>
      var i = 0; while (i < dim) { msum(i) += rz(x(i) * 1e8); i += 1 }
    }
    val mean = msum.map(_ / (1e8 * n))
    var v = Array.fill(dim)(0.125)
    var norm = 0.0
    (1 to 12).foreach { _ =>
      val acc = new Array[Long](dim)
      xs.foreach { x =>
        var dq = 0L; var i = 0
        while (i < dim) { dq += rz((x(i) - mean(i)) * v(i) * 1e9); i += 1 }
        val d = dq / 1e9
        i = 0
        while (i < dim) { acc(i) += rz((x(i) - mean(i)) * d * 1e8); i += 1 }
      }
      val q = acc.map(sv => rz((sv / 1e8) * (sv / 1e8) * 1e9)).sum
      norm = math.sqrt(q / 1e9)
      v = acc.map(sv => (sv / 1e8) / norm)
    }
    val piv = v.indices.maxBy(i => math.abs(v(i)))
    val sign = if (v(piv) < 0) -1.0 else 1.0
    val lam = rz(norm / n * 1e4) / 1e4
    rows.foreach { r =>
      val i = r.getAs[Long]("component").toInt
      assert(r.getAs[Double]("loading") == rz(v(i) * sign * 1e6) / 1e6,
        s"component $i: ${r.getAs[Double]("loading")} vs ${v(i) * sign}")
      assert(r.getAs[Double]("eigenvalue") == lam)
    }
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
