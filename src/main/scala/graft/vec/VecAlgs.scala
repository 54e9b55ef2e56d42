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
  def cellCount(n: Long): Long =
    math.min(65536L, math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong))

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
