package graft

import graft.rc.Esn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form and cross-implementation checks for the RC core
  * (SURVEY §5.5): the distributed fold must equal a scalar in-test ESN,
  * matrices must be bit-deterministic, and the ridge solver must invert
  * known systems.
  */
class EsnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("matrices are deterministic across calls") {
    val a = Esn.matrices()
    val b = Esn.matrices()
    assert(a.win.sameElements(b.win))
    assert(a.w.map(_.toSeq).toSeq == b.w.map(_.toSeq).toSeq)
  }

  test("recurrent matrix has spectral radius < 1 (echo state property)") {
    val m = Esn.matrices()
    // deterministic power iteration on the scaled matrix
    var v = Array.fill(Esn.Nx)(1.0)
    var lambda = 0.0
    (0 until 300).foreach { _ =>
      val nv = m.w.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      lambda = math.sqrt(nv.map(x => x * x).sum)
      if (lambda > 0) v = nv.map(_ / lambda)
    }
    assert(lambda < 1.0, s"rho = $lambda")
    assert(lambda > 0.3, s"rho suspiciously small = $lambda")
  }

  test("constant input converges to a fixed point") {
    val m = Esn.matrices()
    var x = new Array[Double](Esn.Nx)
    var prev = x
    (0 until 300).foreach { _ => prev = x; x = Esn.step(m, x, 0.5) }
    val delta = x.zip(prev).map { case (a, b) => math.abs(a - b) }.max
    assert(delta < 1e-9, s"not converged: max step delta $delta")
  }

  test("distributed reservoir states equal the scalar reference ESN") {
    // scalar reference: fold the first user's series collected and sorted
    val m = Esn.matrices()
    val events = T(spark, TestSpark.Sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val uid = events.head._1
    val series = events.filter(_._1 == uid).sortBy(r => (r._3, r._2))
    var x = new Array[Double](Esn.Nx)
    val expected = series.map { r =>
      x = Esn.step(m, x, r._4 / Esn.InputScale)
      BigDecimal(x(0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = SparkEntry.queries("rc_reservoir_states")(spark, TestSpark.Sf)
      .filter(col("user_id") === uid)
      .orderBy("step")
      .select("x0")
      .collect()
      .map(_.getDouble(0))
    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"state x0 mismatch at step $i: $g != $e")
    }
  }

  test("rc_deep_esn layer-2 states equal the stacked driver reference") {
    val m1 = Esn.matrices()
    val m2 = Esn.matricesM(nu = Esn.Nx, seed = 43L)
    val events = T(spark, TestSpark.Sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val uid = events.head._1
    val series = events.filter(_._1 == uid).sortBy(r => (r._3, r._2))
    var x1 = new Array[Double](Esn.Nx)
    var x2 = new Array[Double](Esn.Nx)
    val expected = series.map { r =>
      x1 = Esn.step(m1, x1, r._4 / Esn.InputScale)
      x2 = Esn.stepM(m2, x2, x1)
      (BigDecimal(x1(0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(x2(0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = SparkEntry.queries("rc_deep_esn")(spark, TestSpark.Sf)
      .filter(col("user_id") === uid)
      .orderBy("step")
      .select("l1_x0", "l2_x0")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"deep state mismatch at step $i: $g != $e")
    }
    // the two layers decorrelate: their state traces differ
    assert(got.exists { case (a, b) => a != b })
  }

  test("ridgeSolve inverts a known diagonal system") {
    val d = 4
    val a = Array.tabulate(d, d)((i, j) => if (i == j) 2.0 else 0.0)
    val b = Array(2.0, 4.0, 6.0, 8.0)
    val w = Esn.ridgeSolve(a, b, lambda = 0.0)
    w.zip(Array(1.0, 2.0, 3.0, 4.0)).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12)
    }
    // with regularization: w_i = b_i / (2 + 1)
    val wr = Esn.ridgeSolve(a, b, lambda = 1.0)
    wr.zip(b).foreach { case (g, e) => assert(math.abs(g - e / 3.0) < 1e-12) }
  }

  test("ridgeSolve with lambda=0 solves a full-rank dense system") {
    val a = Array(
      Array(4.0, 1.0, 0.0),
      Array(1.0, 3.0, 1.0),
      Array(0.0, 1.0, 2.0))
    val expectW = Array(1.0, -2.0, 3.0)
    val b = a.map(row => row.zip(expectW).map { case (x, y) => x * y }.sum)
    val w = Esn.ridgeSolve(a, b, 0.0)
    w.zip(expectW).foreach { case (g, e) => assert(math.abs(g - e) < 1e-10) }
  }

  test("rc_readout_train learns a near-linear series predictor") {
    // the readout is trained to predict value(t+1); on this synthetic data
    // it should at least produce finite, deterministic weights
    val w1 = SparkEntry.queries("rc_readout_train")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val w2 = SparkEntry.queries("rc_readout_train")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(w1.length == 2 + Esn.Nx)
    assert(w1.forall { case (_, w) => !w.isNaN && !w.isInfinite })
    assert(w1.sameElements(w2), "readout weights not run-deterministic")
  }

  test("lm_online_sgd is deterministic and finite") {
    val r1 = SparkEntry.queries("lm_online_sgd")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1.forall { case (_, _, w) => !w.isNaN && !w.isInfinite })
  }

  test("online SGD recovers the slope of an exactly-linear series") {
    // y(t+1) = 0.8 * y(t): the single-weight model w·x -> next value
    // converges to 0.8 under the same update rule the operator uses
    var v = 400.0
    var wgt = 0.0
    val eta = 0.1
    (0 until 2000).foreach { _ =>
      val x = v / Esn.InputScale
      val y = (v * 0.8) / Esn.InputScale
      wgt += eta * (y - wgt * x) * x
      v = if (v < 1.0) 400.0 else v * 0.8 // restart the decaying series
    }
    assert(math.abs(wgt - 0.8) < 0.05, s"w = $wgt")
  }
}
