package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 wave 59 pins.
  *
  *  - text_bm25_topk's query 1 uses exactly text_bm25's fixed 3-term
  *    query, so its top-5 must equal the head of text_bm25's top-10 —
  *    the serving path and the single-query op must agree on the same
  *    statistics.
  *  - every text_dup_runs row must certify a TRUE exact duplicated
  *    substring: re-slice the two token arrays and compare; and the run
  *    must be maximal on its diagonal (extending one token either side
  *    breaks equality or leaves a document).
  */
class Wave59Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  /** In-memory reference BPE trainer with the op's exact semantics:
    * frequency-weighted adjacent-pair counts, argmax by (count desc,
    * s1, s2), merge applied as ONE left-to-right non-overlapping
    * ' s1 s2 ' -> ' s1s2 ' replacement pass (Java String.replace — the
    * same scan Spark's and DuckDB's `replace` do). */
  private def refTrain(words: Seq[(String, Long)], k: Int)
      : Seq[(Long, String, String, Long, Long)] = {
    var syms = words.map { case (w, c) =>
      (c, " " + w.toCharArray.mkString(" ") + " ")
    }
    (1 to k).map { r =>
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      syms.foreach { case (c, sym) =>
        val arr = sym.trim.split(" ")
        var i = 0
        while (i < arr.length - 1) {
          counts((arr(i), arr(i + 1))) += c; i += 1
        }
      }
      val ((s1, s2), c) = counts.toSeq
        .minBy { case ((a, b), n) => (-n, a, b) }
      syms = syms.map { case (cnt, sym) =>
        (cnt, sym.replace(s" $s1 $s2 ", s" $s1$s2 "))
      }
      val tokens = syms.map { case (cnt, sym) =>
        cnt * sym.trim.split(" ").length
      }.sum
      (r.toLong, s1, s2, c, tokens)
    }
  }

  test("reference trainer: hand-computed fixture incl. the repeat-run case") {
    // 'abab' after merging (a,b) once is [ab, a, b] — the boundary-space
    // share defers the second occurrence to a LATER round that picks
    // (a,b) again (round 3 here): the documented deviation self-heals
    val got = refTrain(Seq("abab" -> 2L, "ab" -> 1L, "aaa" -> 1L), 3)
    assert(got === Seq(
      (1L, "a", "b", 5L, 10L),
      (2L, "a", "a", 2L, 9L),
      (3L, "a", "b", 2L, 7L)))
  }

  test("text_bpe_train equals the in-memory reference trainer") {
    import org.apache.spark.sql.functions._
    val words = T(spark, TestSpark.Sf, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expect = refTrain(words, graft.ops.Wave59Ops.BpeRounds)
    val got = q("text_bpe_train").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expect)
  }

  test("ivf recall sweep: nested candidate sets make recall monotone") {
    val rows = q("vec_ivf_recall_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (qid, rs) =>
      val byProbe = rs.sortBy(_._1).map(_._3)
      assert(byProbe.zip(byProbe.tail).forall { case (a, b) => b >= a },
        s"recall must be non-decreasing in nprobe for q$qid: " +
          byProbe.mkString(","))
      assert(byProbe.forall(r => r >= 0.0 && r <= 1.0), s"q$qid bounds")
    }
  }

  test("bm25_topk query 1 equals the head of text_bm25's ranking") {
    val topk = q("text_bm25_topk").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val single = q("text_bm25").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .take(5).zipWithIndex
      .map { case ((doc, s), i) => ((i + 1).toLong, doc, s) }
    assert(topk.toSeq === single.toSeq)
  }

  test("every dup run certifies an exact duplicated substring, maximal") {
    val toks = T(spark, TestSpark.Sf, "documents")
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .selectExpr("doc_id", "split(text, ' ') AS toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    val runs = q("text_dup_runs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt,
        r.getLong(3).toInt, r.getLong(4).toInt))
    assert(runs.nonEmpty, "fixture corpus has no dup runs — vacuous")
    runs.foreach { case (da, db, as_, bs, n) =>
      val (a, b) = (toks(da), toks(db))
      // 1-based starts; the run spans n tokens
      val sa = a.slice(as_ - 1, as_ - 1 + n)
      val sb = b.slice(bs - 1, bs - 1 + n)
      assert(sa.length == n && (sa sameElements sb),
        s"run ($da,$db,$as_,$bs,$n) is not an exact substring match")
      // maximality on the diagonal (modulo the occ<=100 boilerplate cut,
      // which this fixture never hits: every shingle is rarer)
      val leftOk = as_ == 1 || bs == 1 ||
        a(as_ - 2) != b(bs - 2)
      val rightOk = as_ - 1 + n >= a.length || bs - 1 + n >= b.length ||
        a(as_ - 1 + n) != b(bs - 1 + n)
      assert(leftOk, s"run ($da,$db,$as_,$bs,$n) extends left")
      assert(rightOk, s"run ($da,$db,$as_,$bs,$n) extends right")
    }
  }
}
