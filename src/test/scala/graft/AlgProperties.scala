package graft

import graft.rc.Esn
import graft.text.TextAlgs
import graft.vec.VecAlgs
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over the pure algorithm kernels (SURVEY §5.4). */
object AlgProperties extends Properties("graft.algs") {

  private val tokenSet: Gen[Set[String]] =
    Gen.containerOf[Set, String](Gen.oneOf(
      (0 until 40).map(i => s"tok$i")))

  property("jaccard within [0,1], symmetric, 1 on self") =
    forAll(tokenSet, tokenSet) { (a, b) =>
      val j = TextAlgs.jaccard(a, b)
      j >= 0.0 && j <= 1.0 &&
        j == TextAlgs.jaccard(b, a) &&
        TextAlgs.jaccard(a, a) == 1.0
    }

  property("jaccard of disjoint non-empty sets is 0") =
    forAll(tokenSet.suchThat(_.nonEmpty)) { a =>
      val b = a.map(_ + "_x")
      TextAlgs.jaccard(a, b) == 0.0
    }

  property("lixsize equals set-intersection size on sorted distinct arrays") =
    forAll(Gen.listOf(Gen.choose(-50L, 50L)),
      Gen.listOf(Gen.choose(-50L, 50L))) { (xs, ys) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, LongType}
      val a = xs.distinct.sorted.toArray
      val b = ys.distinct.sorted.toArray
      val got = graft.functions.SortedLongIntersectSize(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType)))
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Long]
      got == xs.toSet.intersect(ys.toSet).size.toLong
    }

  property("minhash signature is permutation-invariant (set semantics)") =
    forAll(tokenSet) { a =>
      val s1 = TextAlgs.minhash(a.toSeq)
      val s2 = TextAlgs.minhash(a.toSeq.reverse)
      s1.sameElements(s2)
    }

  property("simhash hamming distance is a pseudo-metric") =
    forAll(tokenSet, tokenSet) { (a, b) =>
      val ha = TextAlgs.simhash(a)
      val hb = TextAlgs.simhash(b)
      val d = TextAlgs.hamming64(ha, hb)
      d >= 0 && d <= 64 &&
        d == TextAlgs.hamming64(hb, ha) &&
        TextAlgs.hamming64(ha, ha) == 0
    }

  private val vec: Gen[Array[Double]] =
    Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)
      .suchThat(v => v.exists(x => math.abs(x) > 1e-6))

  property("cosine is scale-invariant for positive scaling") =
    forAll(vec, Gen.chooseNum(0.1, 100.0)) { (v, k) =>
      val scaled = v.map(_ * k)
      math.abs(VecAlgs.cosine(v, scaled) - 1.0) < 1e-9
    }

  property("dot is bilinear in the first argument") =
    forAll(vec, vec, vec) { (a, b, c) =>
      val lhs = VecAlgs.dot(a.zip(b).map { case (x, y) => x + y }, c)
      val rhs = VecAlgs.dot(a, c) + VecAlgs.dot(b, c)
      math.abs(lhs - rhs) <= 1e-6 * (math.abs(lhs) + math.abs(rhs) + 1)
    }

  private val spd: Gen[(Array[Array[Double]], Array[Double])] = for {
    d <- Gen.chooseNum(2, 6)
    m <- Gen.listOfN(d * d, Gen.chooseNum(-1.0, 1.0)).map(_.toArray)
    w <- Gen.listOfN(d, Gen.chooseNum(-2.0, 2.0)).map(_.toArray)
  } yield {
    // A = MᵀM + I is symmetric positive definite
    val mm = m.grouped(d).toArray
    val a = Array.tabulate(d, d) { (i, j) =>
      (0 until d).map(k => mm(k)(i) * mm(k)(j)).sum +
        (if (i == j) 1.0 else 0.0)
    }
    (a, w)
  }

  property("ridgeSolve(lambda=0) inverts SPD systems") =
    forAll(spd) { case (a, w) =>
      val b = a.map(row => row.zip(w).map { case (x, y) => x * y }.sum)
      val got = Esn.ridgeSolve(a, b, 0.0)
      got.zip(w).forall { case (g, e) => math.abs(g - e) < 1e-6 }
    }

  property("reservoir state stays bounded in (-1,1) (tanh contraction)") =
    forAll(Gen.listOfN(50, Gen.chooseNum(-1.0, 1.0))) { us =>
      val m = Esn.matrices()
      var x = new Array[Double](Esn.Nx)
      us.foreach { u => x = Esn.step(m, x, u) }
      x.forall(v => v > -1.0 && v < 1.0)
    }

  property("rolling fingerprint is deterministic") =
    forAll(Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d"))) { toks =>
      TextAlgs.rollingFingerprint(toks) ==
        TextAlgs.rollingFingerprint(toks)
    }

}
