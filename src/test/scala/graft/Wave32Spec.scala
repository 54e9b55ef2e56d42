package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-32 semantics vs an in-memory recompute. */
class Wave32Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("vec_semdedup: cell assignment and within-cell cosine drops " +
      "match a pure-Scala replay; something is actually dropped") {
    val got = SparkEntry.queries("vec_semdedup")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val embs = T(spark, TestSpark.Sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(x => math.round(x.toDouble * 1e7)).toArray))
    val k = graft.vec.VecAlgs.cellCount(embs.length.toLong)
    val cents = embs.filter(_._1 < k)
    val cells = embs.map { case (id, g) =>
      val cell = cents.map { case (cid, cg) =>
        (g.zip(cg).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min._2
      (id, cell, g)
    }
    val byCell = cells.groupBy(_._2)
    val dropped = byCell.values.flatMap { vs =>
      val sorted = vs.sortBy(_._1)
      for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        u = sorted(i); v = sorted(j)
        dot = u._3.zip(v._3).map { case (a, b) => a * b }.sum
        n2u = u._3.map(x => x * x).sum
        n2v = v._3.map(x => x * x).sum
        cos = math.round(dot / math.sqrt(n2u.toDouble * n2v.toDouble)
          * 1e9) / 1e9
        if cos > 0.3
      } yield v._1
    }.toSet
    val want = byCell.map { case (cell, vs) =>
      (cell, vs.length.toLong, vs.count(v => dropped(v._1)).toLong)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.map(_._3).sum > 0, "near-duplicates exist and are dropped")
    assert(got.map(_._3).sum < got.map(_._2).sum / 2,
      "dedup keeps the majority")
  }
}
