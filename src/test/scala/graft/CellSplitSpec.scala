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
}
