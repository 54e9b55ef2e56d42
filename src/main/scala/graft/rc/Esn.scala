package graft.rc

import graft.text.SplitMix64

/** Echo State Network internals (the reference's reservoir-computing core,
  * re-expressed): fixed random input weights W_in, sparse recurrent W scaled
  * to a target spectral radius < 1 (echo state property), state update
  * x(t) = tanh(W_in·u(t) + W·x(t−1)).
  *
  * Matrices are generated on the driver from SplitMix64(seed) — identical on
  * every JVM — and captured by value into executor closures (N_x = 32 ⇒
  * ~8 KB; at larger N_x use an explicit broadcast). The spectral radius is
  * estimated by deterministic power iteration (no external linalg dep in
  * this offline build); accuracy only needs ρ(W) < 1, determinism is exact.
  */
object Esn {

  val Nx = 32
  val InputScale = 500.0 // events.value ∈ (0, ~490] → u ∈ (0, 1]

  final case class Mats(win: Array[Double], w: Array[Array[Double]])
      extends Serializable

  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val out = new Array[Double](m.length)
    var i = 0
    while (i < m.length) {
      var s = 0.0
      val row = m(i)
      var j = 0
      while (j < row.length) { s += row(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  private def norm2(v: Array[Double]): Double =
    math.sqrt(v.map(x => x * x).sum)

  def matrices(nx: Int = Nx, seed: Long = 42L, density: Double = 0.1,
      targetRho: Double = 0.9): Mats = {
    val rng = new SplitMix64(seed)
    val win = Array.fill(nx)(rng.nextDouble() - 0.5)
    val w = Array.fill(nx, nx)(
      if (rng.nextDouble() < density) rng.nextDouble() - 0.5 else 0.0)
    // deterministic power iteration; take the max of the trailing estimates
    // so complex-pair oscillation can't overestimate the scale factor
    var v = Array.fill(nx)(1.0)
    var lambda = 0.0
    var maxTail = 0.0
    var it = 0
    while (it < 200) {
      val nv = matVec(w, v)
      lambda = norm2(nv)
      if (lambda > 0) v = nv.map(_ / lambda)
      if (it >= 190 && lambda > maxTail) maxTail = lambda
      it += 1
    }
    val rho = if (maxTail > 0) maxTail else 1.0
    Mats(win, w.map(_.map(x => x * targetRho / rho)))
  }

  /** One reservoir update: x' = tanh(W_in·u + W·x). */
  def step(m: Mats, x: Array[Double], u: Double): Array[Double] = {
    val wx = matVec(m.w, x)
    val out = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      out(i) = math.tanh(m.win(i) * u + wx(i))
      i += 1
    }
    out
  }

  /** One LEAKY-INTEGRATOR update (Jaeger's standard ESN formulation):
    * x' = (1−α)·x + α·tanh(W_in·u + W·x). α = 1 reduces exactly to
    * [[step]]; smaller α slows the state's time constant so the
    * reservoir integrates over longer input horizons — the knob that
    * matches reservoir dynamics to the signal's timescale.
    */
  def stepLeaky(m: Mats, x: Array[Double], u: Double,
      alpha: Double): Array[Double] = {
    val wx = matVec(m.w, x)
    val out = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      out(i) = (1 - alpha) * x(i) +
        alpha * math.tanh(m.win(i) * u + wx(i))
      i += 1
    }
    out
  }

  /** Design vector [1, u, x₀..x₃₁] for the linear readout. */
  def designRow(u: Double, x: Array[Double]): Array[Double] = {
    val phi = new Array[Double](2 + x.length)
    phi(0) = 1.0
    phi(1) = u
    System.arraycopy(x, 0, phi, 2, x.length)
    phi
  }

  // ---- multivariate input (the reference's (index, value-VECTOR) records)

  final case class MatsM(win: Array[Array[Double]], w: Array[Array[Double]])
      extends Serializable

  /** Multivariate W_in (nx × nu) + recurrent W. With nu = 1 the draw order
    * matches [[matrices]], so the scalar path is the nu=1 special case.
    */
  def matricesM(nu: Int, nx: Int = Nx, seed: Long = 42L,
      density: Double = 0.1, targetRho: Double = 0.9): MatsM = {
    val rng = new SplitMix64(seed)
    val win = Array.fill(nx, nu)(rng.nextDouble() - 0.5)
    val w = Array.fill(nx, nx)(
      if (rng.nextDouble() < density) rng.nextDouble() - 0.5 else 0.0)
    var v = Array.fill(nx)(1.0)
    var lambda = 0.0
    var maxTail = 0.0
    var it = 0
    while (it < 200) {
      val nv = matVec(w, v)
      lambda = norm2(nv)
      if (lambda > 0) v = nv.map(_ / lambda)
      if (it >= 190 && lambda > maxTail) maxTail = lambda
      it += 1
    }
    val rho = if (maxTail > 0) maxTail else 1.0
    MatsM(win, w.map(_.map(x => x * targetRho / rho)))
  }

  /** One reservoir update for vector input: x' = tanh(W_in·u + W·x). */
  def stepM(m: MatsM, x: Array[Double], u: Array[Double]): Array[Double] = {
    val wx = matVec(m.w, x)
    val out = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      var s = wx(i)
      val wi = m.win(i)
      var j = 0
      while (j < u.length) { s += wi(j) * u(j); j += 1 }
      out(i) = math.tanh(s)
      i += 1
    }
    out
  }

  /** Design vector [1, u..., x...] for the multivariate readout. */
  def designRowM(u: Array[Double], x: Array[Double]): Array[Double] = {
    val phi = new Array[Double](1 + u.length + x.length)
    phi(0) = 1.0
    System.arraycopy(u, 0, phi, 1, u.length)
    System.arraycopy(x, 0, phi, 1 + u.length, x.length)
    phi
  }

  /** Solve (A + λI) w = b by Gaussian elimination with partial pivoting —
    * deterministic, O(d³) on the driver for d = 34.
    */
  def ridgeSolve(a: Array[Array[Double]], b: Array[Double],
      lambda: Double): Array[Double] = {
    val d = b.length
    val m = Array.tabulate(d, d)((i, j) =>
      a(i)(j) + (if (i == j) lambda else 0.0))
    val y = b.clone()
    var col = 0
    while (col < d) {
      var piv = col
      var i = col + 1
      while (i < d) {
        if (math.abs(m(i)(col)) > math.abs(m(piv)(col))) piv = i
        i += 1
      }
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val ty = y(col); y(col) = y(piv); y(piv) = ty
      val p = m(col)(col)
      i = col + 1
      while (i < d) {
        val f = m(i)(col) / p
        var j = col
        while (j < d) { m(i)(j) -= f * m(col)(j); j += 1 }
        y(i) -= f * y(col)
        i += 1
      }
      col += 1
    }
    val w = new Array[Double](d)
    var i2 = d - 1
    while (i2 >= 0) {
      var s = y(i2)
      var j = i2 + 1
      while (j < d) { s -= m(i2)(j) * w(j); j += 1 }
      w(i2) = s / m(i2)(i2)
      i2 -= 1
    }
    w
  }
}
