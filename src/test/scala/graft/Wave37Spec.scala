package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave 37: LPA, k-core, SAX motifs, incremental dedup. */
class Wave37Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("graph_label_propagation: labels are member node ids and the " +
      "graph actually fragments into multiple communities") {
    val got = SparkEntry.queries("graph_label_propagation")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("n_nodes")))
    assert(got.length >= 2, s"expected several communities, got $got")
    // sizes are positive and sorted desc (ties by label asc)
    assert(got.forall(_._2 >= 2))
    val sizes = got.map(_._2)
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
  }

  test("graph_k_core: peeling is monotone and strictly reduces a " +
      "non-degenerate graph") {
    val rows = SparkEntry.queries("graph_k_core")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    val ns = rows.map(_._2); val es = rows.map(_._3)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(es.zip(es.tail).forall { case (a, b) => a >= b })
    assert(ns.head > ns.last,
      "k=3 peel must remove something on the co-purchase graph")
  }

  test("ts_sax_motifs: words are 8-symbol strings over {a,b,c,d} and " +
      "every reported motif repeats") {
    val rows = SparkEntry.queries("ts_sax_motifs")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n")))
    // the fixture has repeated shapes at sf0.001 (19 motifs measured);
    // at least SOME must surface
    assert(rows.nonEmpty)
    rows.foreach { case (_, w, n) =>
      assert(w.length == 8 && w.forall("abcd".contains(_)), w)
      assert(n >= 2)
    }
  }

  test("data_incremental_dedup: n_new = n_unique + n_dups and matches " +
      "a direct whole-corpus computation") {
    val got = SparkEntry.queries("data_incremental_dedup")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_unique"), r.getAs[Long]("n_dups")))
    assert(got.nonEmpty)
    got.foreach { case (lang, n, u, d) =>
      assert(n == u + d, s"$lang: $n != $u + $d")
    }
    // direct recompute (no snapshot machinery): batch-2 fingerprints
    // not present in batch 1
    val docs = T(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("lang"), md5(col("text")).as("fp"))
    val b1 = docs.filter(col("doc_id") % 2 === 0).select("fp").distinct()
    val direct = docs.filter(col("doc_id") % 2 === 1)
      .join(b1, Seq("fp"), "left_anti")
      .groupBy("lang").agg(count(lit(1)).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (lang, _, u, _) =>
      assert(direct.getOrElse(lang, 0L) == u, s"$lang unique mismatch")
    }
  }
}
