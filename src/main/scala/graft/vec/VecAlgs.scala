package graft.vec

import graft.text.SplitMix64

/** Pure, deterministic vector helpers for the ANN operators. */
object VecAlgs {

  /** Bucket/centroid count for the cell-partitioned ANN and semantic-
    * dedup operators: ⌈√n⌉ cells keep the EXPECTED per-cell population
    * at ~√n, so the within-cell quadratic work is n·√n total and keeps
    * shrinking relative to n as the table grows — the standard IVF
    * sizing rule. Fixed floors/caps protect tiny fixtures (≥1) and the
    * broadcast centroid table (≤65536: a 64-dim float codebook at the
    * cap is ~16 MB, still broadcastable).
    */
  def cellCount(n: Long): Long = cellSplit(n)._1

  /** Default coarse-layer cap: a 64-dim float codebook at 65536 cells is
    * ~16 MB — still broadcastable. */
  val BroadcastCellCap = 65536L

  /** The house 1e7 integer-grid quantization of an `embedding` column,
    * as a SQL expression string. ONE definition shared by the batch ops
    * (Wave56) and the streaming twin (Wave61) so the grid cannot drift
    * between an op and its oracle — the oracle SQL embeds the identical
    * `list_transform` text. */
  val GridExpr: String =
    "transform(embedding, x -> " +
      "CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT))"

  /** Two-level cell sizing: `(coarse, sub)` where `coarse` is the
    * broadcast first-layer centroid count (<= cap) and `sub` is the
    * per-coarse-cell second-layer split. Below the cap this degenerates
    * to the single-level ⌈√n⌉ scheme (`sub = 1`); past the cap —
    * ⌈√n⌉ > cap, i.e. n > ~4.3e9 rows at the default cap — the coarse
    * layer saturates at `cap` and the second layer splits each coarse
    * cell into ⌈√n/cap⌉ sub-cells, each routed by that cell's OWN
    * sub-centroids (a partitioned centroid table probed by join on the
    * coarse cell id — never a second broadcast). Total cells stay
    * >= ⌈√n⌉, so the expected per-cell population stays <= √n at every
    * n: the within-cell quadratic stage remains n·√n work while the
    * driver-side broadcast stays bounded. `vec_semdedup_2level`
    * (ops/Wave54Ops.scala) is the oracle-checked operator form, run with
    * a reduced cap so both layers are exercised at fixture scale;
    * CellSplitSpec pins the sizing law across the real cap boundary AND
    * the engaged two-level path of each production op on a forced small
    * cap. The production ops (vec_semdedup, vec_knn_probe,
    * vec_cluster_purity, vec_incremental_semdedup) call this split and
    * route through [[IvfRouting]]: the second layer engages exactly when
    * `sub > 1`, and below the boundary they stay on the proven
    * single-level plan (no window, no second join — also pinned).
    */
  def cellSplit(n: Long, cap: Long = BroadcastCellCap): (Long, Long) = {
    val want = math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val coarse = math.min(cap, want)
    val sub = math.max(1L, math.ceil(want.toDouble / coarse).toLong)
    (coarse, sub)
  }

  /** Seeded random hyperplanes (nPlanes x dim) for sign-LSH bucketing. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new SplitMix64(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextDouble() * 2.0 - 1.0))
  }

  /** Sign-bit bucket id of a vector under the given hyperplanes. */
  def bucket(planes: Array[Array[Double]], v: Array[Double]): Int = {
    var b = 0
    var i = 0
    while (i < planes.length) {
      var d = 0.0
      var j = 0
      val p = planes(i)
      while (j < p.length) { d += p(j) * v(j); j += 1 }
      if (d >= 0) b |= (1 << i)
      i += 1
    }
    b
  }

  /** Σ (aᵢ−bᵢ)² left-to-right in double — the SAME accumulation order as
    * the codegen'd fvl2 expression and the DuckDB positional-unnest sum,
    * so driver-side probe selection (vec_knn_probe) is bit-identical to
    * both distributed formulations. */
  def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cosine similarity; 0.0 for zero-norm inputs (a NaN would otherwise
    * sort ABOVE every real similarity in Spark's ordering and float a
    * zero embedding to the top of kNN rankings). */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    if (d == 0.0) 0.0 else dot(a, b) / d
  }
}
