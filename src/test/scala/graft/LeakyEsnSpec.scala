package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.rc.Esn

/** Leaky-integrator ESN semantics. */
class LeakyEsnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stepLeaky with alpha = 1 reduces exactly to the plain step") {
    val m = Esn.matrices()
    val rng = new graft.text.SplitMix64(7L)
    var x = Array.fill(Esn.Nx)(rng.nextDouble() - 0.5)
    for (_ <- 1 to 20) {
      val u = rng.nextDouble()
      val a = Esn.step(m, x, u)
      val b = Esn.stepLeaky(m, x, u, 1.0)
      assert(a.sameElements(b), "alpha=1 must be the plain recurrence")
      x = a
    }
  }

  test("rc_leaky_esn: distributed states equal a pure-Scala replay and " +
      "move slower than the non-leaky reservoir") {
    val got = SparkEntry.queries("rc_leaky_esn")(spark, TestSpark.Sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.nonEmpty)
    val m = Esn.matrices()
    val raw = T(spark, TestSpark.Sf, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def replay(alpha: Option[Double]): Map[(Long, Long), Seq[Double]] =
      raw.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
        var x = new Array[Double](Esn.Nx)
        evs.sortBy(e => (e._2, e._3)).zipWithIndex.toSeq.map { case (e, i) =>
          x = alpha match {
            case Some(a) => Esn.stepLeaky(m, x, e._4 / Esn.InputScale, a)
            case None => Esn.step(m, x, e._4 / Esn.InputScale)
          }
          (u, i.toLong) -> x.take(4).toSeq
        }
      }.toMap
    val wantLeaky = replay(Some(0.5))
    assert(got.keySet == wantLeaky.keySet)
    got.foreach { case (k, v) =>
      v.zip(wantLeaky(k)).foreach { case (g, w) =>
        assert(math.abs(g - BigDecimal(w).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"$k")
      }
    }
    // leaky states change less per step than the plain reservoir's
    val plain = replay(None)
    def meanDelta(states: Map[(Long, Long), Seq[Double]]): Double = {
      val ds = states.toSeq.flatMap { case ((u, i), v) =>
        states.get((u, i + 1)).map(n =>
          n.zip(v).map { case (a, b) => math.abs(a - b) }.sum)
      }
      ds.sum / ds.length
    }
    assert(meanDelta(wantLeaky) < meanDelta(plain),
      "alpha = 0.5 must slow the state dynamics")
  }
}
