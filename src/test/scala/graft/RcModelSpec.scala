package graft

import graft.rc.RcOps
import org.scalatest.funsuite.AnyFunSuite

/** Model persistence: the save/load round-trip must lose NOTHING — the
  * loaded model's holdout scores are byte-identical to the directly
  * fitted model's (rc_predict_mse).
  */
class RcModelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def run(name: String) =
    RcOps.queries.find(_.name == name).get.fn(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq

  test("roundtripped model scores identically to the direct fit") {
    assert(run("rc_model_roundtrip") === run("rc_predict_mse"))
  }
}
