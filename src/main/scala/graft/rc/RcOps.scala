package graft.rc

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.10 — time-series / reservoir-computing operators (the
  * flink-rc core semantics, Spark-first).
  *
  * The ESN recurrence is the one genuinely sequential computation in the
  * engine: it parallelizes ACROSS keys (user_id), not within one. The
  * batch implementation is `groupByKey.flatMapGroups` with an in-group sort
  * by (ts, event_id) — one shuffle on user_id, then a per-key fold. At
  * 100 TB with long per-key series, swap the in-memory group sort for
  * secondary sort (`repartitionAndSortWithinPartitions`) and checkpointed
  * state; the streaming twin (graft.streaming) carries the state in
  * `flatMapGroupsWithState`. Readout training is a single
  * `treeAggregate` of the 34×34 Gram matrix — constant-size state per
  * partition, merged log-depth, solved once on the driver: the classic
  * distributed-normal-equations shape that survives any row count.
  */
object RcOps extends QueryModule {

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** events as (user_id, event_id, ts_us, value) */
  private def series(s: SparkSession, dir: String): Dataset[(Long, Long, Long, Double)] = {
    import s.implicits._
    T(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")), col("value"))
      .as[(Long, Long, Long, Double)]
  }

  /** Per-user sorted fold of the reservoir: emits one design row per step
    * plus the one-step-ahead target (None at the tail).
    * Fields: (user_id, step, nSteps, phi[34], target)
    */
  private def foldedDesign(s: SparkSession, dir: String)
      : Dataset[(Long, Long, Long, Array[Double], Option[Double])] = {
    import s.implicits._
    val m = Esn.matrices()
    series(s, dir)
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val rows = it.toArray.sortBy(r => (r._3, r._2))
        val n = rows.length.toLong
        var x = new Array[Double](Esn.Nx)
        rows.iterator.zipWithIndex.map { case ((_, _, _, v), i) =>
          val u = v / Esn.InputScale
          x = Esn.step(m, x, u)
          val target =
            if (i + 1 < rows.length) Some(rows(i + 1)._4 / Esn.InputScale)
            else None
          (uid, i.toLong, n, Esn.designRow(u, x), target)
        }
      }
  }

  /** Gram-accumulate (XᵀX, Xᵀy) over design rows and ridge-solve. */
  private def trainReadout(
      rows: Dataset[(Long, Long, Long, Array[Double], Option[Double])],
      lambda: Double): Array[Double] = {
    val d = 2 + Esn.Nx
    val (gram, xty, _) = rows
      .filter(r => r._5.isDefined && r._2 < trainCut(r._3))
      .rdd
      .treeAggregate((Array.fill(d, d)(0.0), Array.fill(d)(0.0), 0L))(
        seqOp = { case ((a, b, c), (_, _, _, phi, Some(y))) =>
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

  /** usable (target-bearing) rows per user = n−1; train = first 80%. */
  private def trainCut(n: Long): Long = math.floor(0.8 * (n - 1)).toLong

  def queries: Seq[Q] = Seq(
    Q(
      "ts_align_horizon",
      // RC input/target alignment: pair u(t) with y(t+h), h = 3.
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            col("value").as("u_val"),
            lead("value", 3).over(w).as("y_val"))
          .orderBy("event_id")
      },
      Some(
        "SELECT user_id, event_id, value AS u_val, lead(value, 3) OVER " +
          "(PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS y_val " +
          "FROM events ORDER BY event_id")
    ),
    Q(
      "ts_train_test_split",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wAll = Window.partitionBy("user_id")
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            row_number().over(w).cast("long").as("rn"),
            count(lit(1)).over(wAll).as("n"))
          .withColumn("split",
            when(col("rn") <= floor(col("n") * 0.8), "train")
              .otherwise("test"))
          .select("user_id", "event_id", "rn", "split")
          .orderBy("event_id")
      },
      Some(
        "WITH t AS (SELECT user_id, event_id, " +
          "CAST(row_number() OVER (PARTITION BY user_id ORDER BY " +
          "CAST(ts AS TIMESTAMP), event_id) AS BIGINT) AS rn, " +
          "count(*) OVER (PARTITION BY user_id) AS n FROM events) " +
          "SELECT user_id, event_id, rn, CASE WHEN rn <= floor(n * 0.8) " +
          "THEN 'train' ELSE 'test' END AS split FROM t ORDER BY event_id")
    ),
    Q(
      "rc_reservoir_states",
      // The ESN recurrence itself; first 4 state dims, rounded.
      (s, dir) => {
        import s.implicits._
        foldedDesign(s, dir)
          .map { case (uid, step, _, phi, _) =>
            // phi = [1, u, x0..]; states start at index 2
            (uid, step, round6(phi(2)), round6(phi(3)), round6(phi(4)),
              round6(phi(5)))
          }
          .toDF("user_id", "step", "x0", "x1", "x2", "x3")
          .orderBy("user_id", "step")
      },
      None
    ),
    Q(
      "rc_readout_train",
      // Ridge readout W_out = (XᵀX + λI)⁻¹ Xᵀy over the train split.
      (s, dir) => {
        import s.implicits._
        val w = trainReadout(foldedDesign(s, dir), lambda = 1e-2)
        s.createDataset(w.toSeq.zipWithIndex
            .map { case (wi, i) => (i.toLong, round6(wi)) })
          .toDF("idx", "weight")
          .orderBy("idx")
      },
      None
    ),
    Q(
      "rc_predict_mse",
      // Score the held-out 20% with the trained readout; per-user MSE.
      // The design rows feed two jobs (Gram aggregation, then scoring) —
      // persist so the reservoir fold runs once, not twice.
      (s, dir) => {
        import s.implicits._
        val rows = foldedDesign(s, dir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val w = trainReadout(rows, lambda = 1e-2)
        rows
          .filter(r => r._5.isDefined && r._2 >= trainCut(r._3))
          .map { case (uid, _, _, phi, Some(y)) =>
            var pred = 0.0
            var i = 0
            while (i < phi.length) { pred += w(i) * phi(i); i += 1 }
            val e = pred - y
            (uid, e * e, 1L)
          }
          .groupByKey(_._1)
          .mapGroups { (uid, it) =>
            var se = 0.0; var n = 0L
            it.foreach { r => se += r._2; n += r._3 }
            (uid, n, round6(se / n))
          }
          .toDF("user_id", "n_test", "mse")
          .orderBy("user_id")
      },
      None
    ),
    Q(
      "lm_online_sgd",
      // flink-rc's online linear model: per-user sequential SGD
      // w ← w + η(y − w·x)x over the ordered stream (normalized series).
      (s, dir) => {
        import s.implicits._
        series(s, dir)
          .groupByKey(_._1)
          .mapGroups { (uid, it) =>
            val rows = it.toArray.sortBy(r => (r._3, r._2))
            var wgt = 0.0
            val eta = 0.1
            var i = 0
            while (i + 1 < rows.length) {
              val x = rows(i)._4 / Esn.InputScale
              val y = rows(i + 1)._4 / Esn.InputScale
              wgt += eta * (y - wgt * x) * x
              i += 1
            }
            (uid, (rows.length - 1).toLong, round6(wgt))
          }
          .toDF("user_id", "n_updates", "w")
          .orderBy("user_id")
      },
      None
    )
  )
}
