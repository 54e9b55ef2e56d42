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
