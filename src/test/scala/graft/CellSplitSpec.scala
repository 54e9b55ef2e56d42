package graft

import graft.vec.VecAlgs
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two-level IVF sizing law (`VecAlgs.cellSplit`) across the
  * broadcast-cap boundary: below it the split degenerates to the
  * single-level ⌈√n⌉ scheme; past it the coarse layer saturates at the
  * cap and the sub layer restores total cells >= ⌈√n⌉, so the expected
  * per-cell population stays <= √n at EVERY n while the broadcast side
  * stays bounded. `vec_semdedup_2level` (Wave54Ops) is the operator form.
  */
class CellSplitSpec extends AnyFunSuite {

  private val cap = VecAlgs.BroadcastCellCap // 65536
  private def want(n: Long): Long =
    math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong)

  test("below the cap boundary: single-level degenerate (sub = 1)") {
    for (n <- Seq(1L, 2L, 100L, 12345L, 1000000L, cap * cap)) {
      assert(VecAlgs.cellSplit(n) === ((want(n), 1L)), s"n=$n")
      assert(VecAlgs.cellCount(n) === want(n), s"n=$n")
    }
  }

  test("across the boundary: coarse saturates, sub takes over") {
    // first n past the boundary: want = cap + 1 -> (cap, 2)
    val n1 = (cap + 1) * (cap + 1)
    assert(VecAlgs.cellSplit(n1) === ((cap, 2L)))
    // deep past it: 1e18 -> want = 1e9, sub = ceil(1e9 / 65536)
    val n2 = 1000000000000000000L
    val (c2, s2) = VecAlgs.cellSplit(n2)
    assert(c2 === cap)
    assert(s2 === math.ceil(1e9 / cap.toDouble).toLong)
  }

  test("invariants hold over a geometric sweep spanning the boundary") {
    var n = 1L
    while (n > 0 && n < 4000000000000000000L) {
      val (coarse, sub) = VecAlgs.cellSplit(n)
      assert(coarse >= 1 && coarse <= cap, s"n=$n coarse in [1, cap]")
      assert(sub >= 1, s"n=$n sub >= 1")
      // total cells >= ceil(sqrt(n)) => expected per-cell population
      // n / (coarse * sub) <= n / want <= sqrt(n): the within-cell
      // quadratic stage stays n * sqrt(n) work at every n
      assert(coarse * sub >= want(n), s"n=$n total cells >= ceil(sqrt n)")
      // the split never over-shards by more than one coarse round
      assert(coarse * (sub - 1) < want(n) || sub == 1L,
        s"n=$n sub is the MINIMAL second-level split")
      n *= 7
    }
  }

  test("custom cap (the vec_semdedup_2level fixture shape)") {
    // 500 vectors, cap 4: want = 23 -> coarse 4, sub 6 — both layers live
    assert(VecAlgs.cellSplit(500L, cap = 4L) === ((4L, 6L)))
    // tiny corpus below even the reduced cap: degenerates cleanly
    assert(VecAlgs.cellSplit(9L, cap = 4L) === ((3L, 1L)))
  }

  // ---- conditional routing in the PRODUCTION ops (VERDICT-r10 #1) ----
  // The four ops call VecAlgs.cellSplit and engage IvfRouting's second
  // layer exactly when sub > 1. At the real cap the fixtures stay on the
  // single-level plan (pinned by the plan-shape test); forcing cap=4
  // exercises the engaged path and pins it against the oracle-checked
  // Wave54 twin / a pure-Scala replay of both routing layers.

  private lazy val spark = TestSpark.spark
  private val ForcedCap = 4L

  private def d2L(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }
  private def dotL(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  /** Spark's round(x·10^s)/10^s on doubles: BigDecimal HALF_UP. */
  private def rnd(x: Double, s: Int): Double = {
    val f = math.pow(10, s)
    java.math.BigDecimal.valueOf(x * f)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / f
  }

  /** (vec_id, label, integer-grid vector) fixture rows. */
  private lazy val gridded: Seq[(Long, String, Array[Long])] =
    T(spark, TestSpark.Sf, "embeddings")
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> " +
          "CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS g")
      .collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)),
        r.getSeq[Long](2).toArray)).toSeq.sortBy(_._1)

  /** Two-level replay: id -> (cell, scell) over explicit centroids, the
    * sub-centroid table derived from `indexVs` (the batch the index was
    * built from), ties to lowest id at both layers. Returns also the
    * sub-centroid table for probe-side reuse. */
  private def replayFine(
      vs: Seq[(Long, Array[Long])], cents: Seq[(Long, Array[Long])],
      sub: Long, subCents: Map[Long, Seq[(Long, Array[Long])]])
      : Seq[(Long, Long, Long)] =
    vs.flatMap { case (id, g) =>
      val cell = cents.map { case (cid, cg) => (d2L(g, cg), cid) }.min._2
      subCents.get(cell).map { scs =>
        val scell =
          scs.map { case (scid, sg) => (d2L(g, sg), scid) }.min._2
        (id, cell, scell)
      }
    }

  private def replaySubCents(
      coarse: Seq[(Long, Long, Array[Long])], sub: Long)
      : Map[Long, Seq[(Long, Array[Long])]] =
    coarse.groupBy(_._2).map { case (cell, members) =>
      cell -> members.sortBy(_._1).take(sub.toInt).zipWithIndex
        .map { case ((_, _, g), i) => ((i + 1).toLong, g) }
    }

  test("forced cap: vec_semdedup equals the oracle-checked Wave54 twin") {
    val got = graft.ops.Wave32Ops
      .semdedupBody(spark, TestSpark.Sf, cap = ForcedCap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val twin = graft.ops.Wave54Ops.queries
      .find(_.name == "vec_semdedup_2level").get
      .fn(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).toSeq
      .map { case (cell, rs) => (cell, rs.map(_._2).sum, rs.map(_._3).sum) }
      .sortBy(_._1)
    assert(got.toSeq === twin)
  }

  test("forced cap: vec_cluster_purity matches a two-layer replay") {
    val n = gridded.size.toLong
    val (k, sub) = VecAlgs.cellSplit(n, ForcedCap)
    assert(sub > 1L, "fixture must engage the second layer")
    val cents = gridded.filter(_._1 < k).map(v => (v._1, v._3))
    val coarse = gridded.map { case (id, _, g) =>
      (id, cents.map { case (cid, cg) => (d2L(g, cg), cid) }.min._2, g)
    }
    val scs = replaySubCents(coarse, sub)
    val fine = replayFine(gridded.map(v => (v._1, v._3)), cents, sub, scs)
    val label = gridded.map(v => v._1 -> v._2).toMap
    val clusters = fine.groupBy(f => (f._2, f._3)).values.toSeq
    val nClusters = clusters.size.toLong
    val nPoints = clusters.map(_.size.toLong).sum
    val majority = clusters
      .map(_.groupBy(f => label(f._1)).values.map(_.size).max.toLong).sum
    val singletons = clusters.count(_.size == 1).toLong
    val row = graft.ops.Wave48Ops
      .purityBody(spark, TestSpark.Sf, cap = ForcedCap).collect()(0)
    assert(row.getLong(0) === nClusters)
    assert(row.getLong(1) === nPoints)
    assert(row.getDouble(2) === rnd(majority.toDouble / nPoints, 6))
    assert(row.getDouble(3) === rnd(singletons.toDouble / nClusters, 6))
  }

  test("forced cap: vec_incremental_semdedup matches a two-layer replay") {
    // the 3-batch cadence (VERDICT-r11 #2): b1 builds, b2 probes then
    // is absorbed, b3 probes the b1 ∪ b2 union — all replayed with the
    // FROZEN batch-1 geometry (cents + sub-centroids)
    val b1 = gridded.filter(_._1 % 3 == 0).map(v => (v._1, v._3))
    val b2 = gridded.filter(_._1 % 3 == 1).map(v => (v._1, v._3))
    val b3 = gridded.filter(_._1 % 3 == 2).map(v => (v._1, v._3))
    val (k, sub) = VecAlgs.cellSplit(b1.size.toLong, ForcedCap)
    assert(sub > 1L)
    val cents = b1.filter(_._1 < 3 * k)
    val ca = (vs: Seq[(Long, Array[Long])]) => vs.map { case (id, g) =>
      (id, cents.map { case (cid, cg) => (d2L(g, cg), cid) }.min._2, g)
    }
    val scs = replaySubCents(ca(b1), sub)
    val f1 = replayFine(b1, cents, sub, scs)
    val f2 = replayFine(b2, cents, sub, scs)
    val f3 = replayFine(b3, cents, sub, scs)
    val g = gridded.map(v => v._1 -> v._3).toMap
    def dupsOf(fNew: Seq[(Long, Long, Long)],
        index: Seq[(Long, Long, Long)]): Set[Long] = {
      val byFine = index.groupBy(f => (f._2, f._3))
      fNew.filter { case (id, cell, scell) =>
        byFine.getOrElse((cell, scell), Nil).exists { case (oid, _, _) =>
          val (a, b) = (g(id), g(oid))
          rnd(dotL(a, b).toDouble /
            math.sqrt(d2L(a, Array.fill(a.length)(0L)).toDouble *
              d2L(b, Array.fill(b.length)(0L)).toDouble), 9) > 0.3
        }
      }.map(_._1).toSet
    }
    val d2 = dupsOf(f2, f1)
    val d3 = dupsOf(f3, f1 ++ f2) // post-absorb index
    def agg(batch: Long, f: Seq[(Long, Long, Long)], d: Set[Long]) =
      f.groupBy(_._2).toSeq.map { case (cell, ms) =>
        (batch, cell, ms.size.toLong, ms.count(m => d(m._1)).toLong)
      }
    val expect = (agg(2L, f2, d2) ++ agg(3L, f3, d3))
      .sortBy(t => (t._1, t._2))
    val got = graft.ops.Wave56Ops
      .incSemdedupBody(spark, TestSpark.Sf, cap = ForcedCap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect)
  }

  test("forced cap: vec_knn_probe matches a two-layer float replay") {
    val vecs = T(spark, TestSpark.Sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq.sortBy(_._1)
    val (k, sub) = VecAlgs.cellSplit(vecs.size.toLong, ForcedCap)
    assert(sub > 1L)
    val cents = vecs.filter(_._1 < k)
    val coarse = vecs.map { case (id, v) =>
      (id, cents.map { case (cid, cv) =>
        (VecAlgs.l2sq(v, cv), cid) }.min._2, v)
    }
    val scs = coarse.groupBy(_._2).map { case (cell, ms) =>
      cell -> ms.sortBy(_._1).take(sub.toInt).zipWithIndex
        .map { case ((_, _, v), i) => ((i + 1).toLong, v) }
    }
    val fine = coarse.map { case (id, cell, v) =>
      val scell = scs(cell)
        .map { case (scid, sv) => (VecAlgs.l2sq(v, sv), scid) }.min._2
      (id, cell, scell, v)
    }
    val byId = vecs.toMap
    val expect = Seq(5L, 17L, 42L).flatMap { qid =>
      val qv = byId(qid)
      if (VecAlgs.dot(qv, qv) <= 0) Nil
      else {
        val qnrm = math.sqrt(VecAlgs.dot(qv, qv))
        val top2 = cents.map { case (cid, cv) =>
          (VecAlgs.l2sq(qv, cv), cid) }.sorted.take(2).map(_._2)
        val picks = top2.flatMap { cell =>
          scs(cell).map { case (scid, sv) =>
            (VecAlgs.l2sq(qv, sv), scid) }.sorted.take(2)
            .map { case (_, scid) => (cell, scid) }
        }.toSet
        fine.filter { case (id, cell, scell, v) =>
          id != qid && picks((cell, scell)) &&
            math.sqrt(VecAlgs.dot(v, v)) > 0
        }.map { case (id, _, _, v) =>
          val nrm = math.sqrt(VecAlgs.dot(v, v))
          (id, rnd(VecAlgs.dot(v, qv) / (nrm * qnrm), 6))
        }.sortBy { case (id, sim) => (-sim, id) }.take(5).zipWithIndex
          .map { case ((id, sim), i) => (qid, (i + 1).toLong, id, sim) }
      }
    }
    val got = graft.ops.VectorOps
      .knnProbeBody(spark, TestSpark.Sf, cap = ForcedCap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === expect)
  }

  test("assignSub keeps rows whose coarse cell has no sub-centroids") {
    import spark.implicits._
    val coarse = Seq(
      (1L, 0L, Seq(1L, 0L)), (2L, 0L, Seq(2L, 0L)),
      (9L, 5L, Seq(9L, 9L))) // cell 5 has NO sub-centroids
      .toDF("vec_id", "cell", "g")
    val subCents = Seq(
      (0L, 1L, Seq(0L, 0L)), (0L, 2L, Seq(3L, 0L)))
      .toDF("cell", "scid", "sg")
    val got = graft.vec.IvfRouting.assignSub(coarse, subCents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set(
      (1L, 0L, 1L),  // nearest of the two sub-centroids
      (2L, 0L, 2L),
      (9L, 5L, 1L))) // pass-through: degenerate scell, never dropped
  }

  test("default cap: the degenerate path adds no window or extra join") {
    import org.apache.spark.sql.functions._
    val g = T(spark, TestSpark.Sf, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> " +
          "CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS g")
    val cents = g.filter(col("vec_id") < 23)
      .select(col("vec_id").as("cid"), col("g").as("cg"))
    val coarsePlan = graft.vec.IvfRouting.assignCoarse(g, cents)
      .queryExecution.optimizedPlan.toString
    val finePlan = graft.vec.IvfRouting.assignFine(g, cents, sub = 1L)
      .queryExecution.optimizedPlan.toString
    def joins(p: String) = "\\bJoin\\b".r.findAllIn(p).length
    assert(!finePlan.contains("Window"),
      "sub=1 must not build the sub-centroid window")
    assert(joins(finePlan) === joins(coarsePlan),
      "sub=1 must not add a second join")
  }
}
