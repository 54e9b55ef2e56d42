package graft

import graft.ops.{GraphBase, Wave55Ops}
import org.scalatest.funsuite.AnyFunSuite

/** Wave-55 graph analytics pinned against independent driver-side
  * replays (brute-force union-find / triangle scan over the collected
  * fixture edge list — small by construction at sf0.001).
  */
class Wave55Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def q(name: String) =
    Wave55Ops.queries.find(_.name == name).get.fn(spark, TestSpark.Sf)

  private lazy val edges: Array[(Long, Long)] =
    GraphBase.edges(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  private lazy val degree: Map[Long, Int] =
    edges.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (k, vs) => k -> vs.length }

  test("degree_stats: counts conserve and cum_frac ends at 1") {
    val rows = q("graph_degree_stats").collect()
    assert(rows.map(_.getLong(1)).sum === degree.size.toLong)
    assert(rows.last.getDouble(2) === 1.0)
    // histogram equals the driver-side degree census
    val expected = degree.values.groupBy(identity)
      .map { case (d, vs) => d.toLong -> vs.size.toLong }
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap === expected)
  }

  test("clustering_coeff: bucket means match a brute-force triangle scan") {
    val eset = edges.toSet
    val triPer = scala.collection.mutable.Map[Long, Long]()
    // oriented scan: u<v<w, all three edges present
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((u, vs) <- adj; i <- vs.indices; j <- (i + 1) until vs.length
         if eset((vs(i), vs(j)))) {
      Seq(u, vs(i), vs(j)).foreach(x =>
        triPer(x) = triPer.getOrElse(x, 0L) + 1L)
    }
    val expected = degree.filter(_._2 >= 2).groupBy(_._2).map {
      case (d, vm) =>
        val n = vm.size.toLong
        // keysIterator, not keys: mapping a key SET to counts would
        // deduplicate equal counts before the sum
        val st = vm.keysIterator.map(x => triPer.getOrElse(x, 0L)).sum
        (d.toLong, (n, st,
          math.round(2.0 * st / (n * d.toLong * (d - 1)) * 1e6) / 1e6))
    }
    val got = q("graph_clustering_coeff").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expected)
    got.values.foreach { case (_, _, cc) => assert(cc >= 0.0 && cc <= 1.0) }
  }

  test("assortativity is a correlation: |r| <= 1, edge count matches") {
    val row = q("graph_assortativity").collect().head
    assert(row.getLong(0) === edges.length.toLong)
    assert(math.abs(row.getDouble(1)) <= 1.0)
  }

  test("connected_components matches driver-side union-find") {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val comps = degree.keys.toSeq.groupBy(find)
    val expected = comps.map { case (_, vs) =>
      (vs.min, vs.size.toLong) }.toSeq
      .sortBy { case (c, n) => (-n, c) }.take(20)
    val got = q("graph_connected_components").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }
}
