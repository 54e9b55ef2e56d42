package graft.rc

/** Recursive least squares — the ONLINE form of the ridge readout
  * (flink-rc's online linear-model training; SURVEY §0 "Readout training,
  * online", the formulation beyond first-order SGD / `lm_online_sgd`).
  *
  * With P₀ = I/λ and forgetting factor 1, after t updates `w` IS the batch
  * ridge solution (λI + Φ'Φ)⁻¹Φ'y over the processed prefix —
  * algebraically (Sherman–Morrison on the regularized normal equations),
  * not asymptotically. RlsSpec pins the equality against
  * `RcPipeline.fitDesigned` on the Mackey-Glass fixture.
  *
  * O(d²) work per update and O(d²) state (P flattened row-major) — a
  * constant per key, which is exactly the bounded-state requirement for
  * the `transformWithState` streaming twin.
  */
object Rls {

  /** `p` is the d×d inverse-Gram estimate, row-major; `n` counts updates. */
  final case class State(p: Array[Double], w: Array[Double], n: Long)

  def init(d: Int, lambda: Double): State = {
    val p = new Array[Double](d * d)
    var i = 0
    while (i < d) { p(i * d + i) = 1.0 / lambda; i += 1 }
    State(p, new Array[Double](d), 0L)
  }

  /** One update with observation (phi, y). Returns a fresh State (inputs
    * untouched — safe to hold in Spark state stores). */
  def update(st: State, phi: Array[Double], y: Double): State = {
    val d = phi.length
    val p = st.p
    // v = P·phi (P symmetric, so v' = phi'P too)
    val v = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      val off = i * d
      while (j < d) { s += p(off + j) * phi(j); j += 1 }
      v(i) = s
      i += 1
    }
    var denom = 1.0
    i = 0
    while (i < d) { denom += phi(i) * v(i); i += 1 }
    var pred = 0.0
    i = 0
    while (i < d) { pred += st.w(i) * phi(i); i += 1 }
    val e = y - pred
    val w2 = new Array[Double](d)
    i = 0
    while (i < d) { w2(i) = st.w(i) + v(i) * e / denom; i += 1 }
    // P ← P − v·v'/denom (rank-1 downdate; symmetry preserved exactly)
    val p2 = new Array[Double](d * d)
    i = 0
    while (i < d) {
      val off = i * d
      val vi = v(i)
      var j = 0
      while (j < d) { p2(off + j) = p(off + j) - vi * v(j) / denom; j += 1 }
      i += 1
    }
    State(p2, w2, st.n + 1)
  }
}
