package graft.rc

import org.apache.spark.sql.Dataset

/** Public reservoir-computing API over arbitrary keyed univariate series —
  * the library surface a user of the reference's ESN modules would target.
  *
  * A series sample is `(key, order, value)`: series are independent per
  * key (parallel across the cluster), sequential within a key (the fold).
  * Horizon-h prediction: train a ridge readout on [1, u(t), x(t)] → u(t+h).
  *
  * Scale: the reservoir fold shuffles once on key; readout training
  * aggregates a (2+Nx)² Gram matrix via `treeAggregate` (constant-size
  * partials, log-depth merge) and solves once on the driver — row count
  * never materializes anywhere.
  */
object RcPipeline {

  /** (key, order1, order2, value) — ordering within a key is the
    * lexicographic (order1, order2) pair (e.g. (ts, event_id)). */
  type Sample = (Long, Long, Long, Double)

  final case class Model(mats: Esn.Mats, w: Array[Double],
      inputScale: Double, horizon: Int, trainFrac: Double)
      extends Serializable

  /** Per-sample design rows: (key, step, nSteps, phi, target). The target
    * is u(t+h) scaled, None within h of the series tail.
    */
  def design(series: Dataset[Sample], mats: Esn.Mats, inputScale: Double,
      horizon: Int): Dataset[(Long, Long, Long, Array[Double], Option[Double])] = {
    import series.sparkSession.implicits._
    series
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        val n = rows.length.toLong
        var x = new Array[Double](Esn.Nx)
        rows.iterator.zipWithIndex.map { case ((_, _, _, v), i) =>
          val u = v / inputScale
          x = Esn.step(mats, x, u)
          val target =
            if (i + horizon < rows.length)
              Some(rows(i + horizon)._4 / inputScale)
            else None
          (key, i.toLong, n, Esn.designRow(u, x), target)
        }
      }
  }

  /** usable (target-bearing) rows per key; train = first trainFrac of them */
  def trainCut(n: Long, horizon: Int, trainFrac: Double): Long =
    math.floor(trainFrac * (n - horizon)).toLong

  /** Fit the ridge readout on the train split of every key's series. */
  def fit(series: Dataset[Sample], lambda: Double,
      inputScale: Double = 1.0, horizon: Int = 1,
      trainFrac: Double = 0.8, seed: Long = 42L): Model = {
    val mats = Esn.matrices(seed = seed)
    fitDesigned(design(series, mats, inputScale, horizon), mats, lambda,
      inputScale, horizon, trainFrac)
  }

  /** Fit from precomputed design rows (lets callers persist them and reuse
    * for scoring — the fold then runs once, not twice).
    */
  def fitDesigned(
      rows: Dataset[(Long, Long, Long, Array[Double], Option[Double])],
      mats: Esn.Mats, lambda: Double, inputScale: Double, horizon: Int,
      trainFrac: Double): Model =
    Model(mats, gramSolve(rows, 2 + Esn.Nx, lambda, horizon, trainFrac),
      inputScale, horizon, trainFrac)

  /** Shared Gram-matrix aggregation + ridge solve over the train split;
    * `d` is the design-row width (2+Nx scalar, 1+nu+Nx multivariate).
    */
  private def gramSolve(
      rows: Dataset[(Long, Long, Long, Array[Double], Option[Double])],
      d: Int, lambda: Double, horizon: Int,
      trainFrac: Double): Array[Double] = {
    val hz = horizon
    val tf = trainFrac
    val (gram, xty, _) = rows
      .filter(r => r._5.isDefined && r._2 < trainCut(r._3, hz, tf))
      .rdd
      .treeAggregate((Array.fill(d, d)(0.0), Array.fill(d)(0.0), 0L))(
        seqOp = { case ((a, b, c), (_, _, _, phi, tOpt)) =>
          val y = tOpt.get
          var i = 0
          while (i < d) {
            val pi = phi(i)
            var j = 0
            while (j < d) { a(i)(j) += pi * phi(j); j += 1 }
            b(i) += pi * y
            i += 1
          }
          (a, b, c + 1)
        },
        combOp = { case ((a1, b1, c1), (a2, b2, c2)) =>
          var i = 0
          while (i < d) {
            var j = 0
            while (j < d) { a1(i)(j) += a2(i)(j); j += 1 }
            b1(i) += b2(i)
            i += 1
          }
          (a1, b1, c1 + c2)
        })
    Esn.ridgeSolve(gram, xty, lambda)
  }

  /** Per-key MSE of the trained readout on each key's held-out tail
    * (in the scaled domain).
    */
  def score(series: Dataset[Sample], model: Model): Dataset[(Long, Long, Double)] =
    scoreDesigned(
      design(series, model.mats, model.inputScale, model.horizon), model)

  /** Score from precomputed design rows. */
  def scoreDesigned(
      rows: Dataset[(Long, Long, Long, Array[Double], Option[Double])],
      model: Model): Dataset[(Long, Long, Double)] = {
    import rows.sparkSession.implicits._
    val w = model.w
    val hz = model.horizon
    val tf = model.trainFrac
    rows
      .filter(r => r._5.isDefined && r._2 >= trainCut(r._3, hz, tf))
      .map { case (key, _, _, phi, tOpt) =>
        var pred = 0.0
        var i = 0
        while (i < phi.length) { pred += w(i) * phi(i); i += 1 }
        val e = pred - tOpt.get
        (key, 1L, e * e)
      }
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        var se = 0.0; var n = 0L
        it.foreach { r => se += r._3; n += r._2 }
        (key, n, se / n)
      }
  }

  // ---- multivariate input (the reference's (index, value-VECTOR) records)

  /** (key, order1, order2, feature vector) — features pre-scaled by the
    * caller; the readout predicts feature 0 at t+h.
    */
  type VSample = (Long, Long, Long, Array[Double])

  final case class ModelM(mats: Esn.MatsM, w: Array[Double], horizon: Int,
      trainFrac: Double) extends Serializable

  /** Design rows for vector input: phi = [1, u..., x...], target =
    * feature 0 at t+h.
    */
  def designM(series: Dataset[VSample], mats: Esn.MatsM, horizon: Int)
      : Dataset[(Long, Long, Long, Array[Double], Option[Double])] = {
    import series.sparkSession.implicits._
    series
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        val n = rows.length.toLong
        var x = new Array[Double](Esn.Nx)
        rows.iterator.zipWithIndex.map { case ((_, _, _, u), i) =>
          x = Esn.stepM(mats, x, u)
          val target =
            if (i + horizon < rows.length) Some(rows(i + horizon)._4(0))
            else None
          (key, i.toLong, n, Esn.designRowM(u, x), target)
        }
      }
  }

  /** Fit the multivariate readout (nu input features). */
  def fitM(series: Dataset[VSample], nu: Int, lambda: Double,
      horizon: Int = 1, trainFrac: Double = 0.8,
      seed: Long = 42L): ModelM = {
    val mats = Esn.matricesM(nu, seed = seed)
    val rows = designM(series, mats, horizon)
    ModelM(mats,
      gramSolve(rows, 1 + nu + Esn.Nx, lambda, horizon, trainFrac),
      horizon, trainFrac)
  }

  /** Per-key held-out MSE for a multivariate model. */
  def scoreM(series: Dataset[VSample], model: ModelM)
      : Dataset[(Long, Long, Double)] = {
    import series.sparkSession.implicits._
    val rows = designM(series, model.mats, model.horizon)
    val w = model.w
    val hz = model.horizon
    val tf = model.trainFrac
    rows
      .filter(r => r._5.isDefined && r._2 >= trainCut(r._3, hz, tf))
      .map { case (key, _, _, phi, tOpt) =>
        var pred = 0.0
        var i = 0
        while (i < phi.length) { pred += w(i) * phi(i); i += 1 }
        val e = pred - tOpt.get
        (key, 1L, e * e)
      }
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        var se = 0.0; var n = 0L
        it.foreach { r => se += r._3; n += r._2 }
        (key, n, se / n)
      }
  }
}
