package graft

import graft.text.TextAlgs
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 wave 60 pins. */
class Wave60Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def rnd6(x: Double): Double =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6

  test("minhash recall equals a driver-side replay of truth + candidates") {
    val docs = T(spark, TestSpark.Sf, "documents")
      .filter("lang = 'en' AND source IN ('src0', 'src1')")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val feats = docs.map { case (id, t) =>
      val dist = t.split(" ").toSeq.distinct
      (id, TextAlgs.lshBands(TextAlgs.minhash(dist)).toSet, dist.toSet)
    }
    var nTrue = 0L; var nCand = 0L; var nCaught = 0L
    for {
      a <- feats; b <- feats
      if a._1 < b._1
    } {
      val inter = (a._3 intersect b._3).size.toDouble
      val jac = math.round(
        inter / (a._3.size + b._3.size - inter) * 1e6) / 1e6
      val isTrue = jac >= 0.8
      val (lo, hi) =
        (math.min(a._3.size, b._3.size).toLong,
          math.max(a._3.size, b._3.size).toLong)
      val isCand = (a._2 intersect b._2).nonEmpty &&
        lo * 10000000L >= hi * 7999995L
      if (isTrue) nTrue += 1
      if (isCand) nCand += 1
      if (isTrue && isCand) nCaught += 1
    }
    val row = q("text_minhash_recall").collect()(0)
    assert(row.getLong(0) === nTrue)
    assert(row.getLong(1) === nCand)
    assert(row.getLong(2) === nCaught)
    assert(row.getDouble(3) === rnd6(nCaught.toDouble / nTrue))
    assert(row.getDouble(4) === rnd6(nCaught.toDouble / nCand))
    assert(nTrue > 0, "slice has no true near-dups — vacuous")
  }

  test("dup coverage is consistent with dup runs and bounded") {
    val cov = q("text_dup_coverage").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val runs = q("text_dup_runs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(cov.nonEmpty && runs.nonEmpty)
    // every doc appearing in a run has a coverage row at least as long
    // as its longest run, never exceeding its token count
    val longest = (runs.map(r => r._1 -> r._3) ++
      runs.map(r => r._2 -> r._3))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).max }
    longest.foreach { case (doc, maxRun) =>
      val (n, dup, c) = cov.getOrElse(doc,
        fail(s"doc $doc has a run but no coverage row"))
      assert(dup >= maxRun && dup <= n, s"doc $doc: $dup vs $maxRun/$n")
      assert(c > 0.0 && c <= 1.0, s"doc $doc coverage $c")
    }
    // and no coverage row without a run
    assert(cov.keySet === longest.keySet)
  }
}
