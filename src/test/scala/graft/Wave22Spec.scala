package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** PQ/ADC pins (no oracle — k-means is iterative): determinism,
  * recall floor, and ADC beating a degenerate baseline.
  */
class Wave22Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("vec_pq_adc: deterministic across runs, full recall rows, " +
      "recall@10 well above random") {
    val a = SparkEntry.queries("vec_pq_adc")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = SparkEntry.queries("vec_pq_adc")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq, "PQ training/encoding must be " +
      "deterministic (fixed init, fixed tie-breaks)")
    assert(a.map(_._1).toSeq == Seq(0L, 1L, 2L))
    a.foreach { case (q, hits, rec) =>
      assert(hits >= 1 && hits <= 10 && rec == hits / 10.0, s"q$q")
      // the query vector itself is in the corpus: ADC distance of the
      // exact row is 0 + quantization error — it should surface, and
      // random recall@10 on 500 vectors is 10/500 = 0.02; demand 10x
      assert(rec >= 0.2, s"query $q recall $rec — PQ must beat random")
    }
    // average recall across queries should be solidly useful
    assert(a.map(_._3).sum / a.length >= 0.3)
  }
}
