package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-24 semantics vs in-memory recomputes. */
class Wave24Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("graph_shortest_path: distances match a sequential BFS") {
    val got = SparkEntry.queries("graph_shortest_path")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sequential BFS over the same bipartite graph
    val ev = T(spark, TestSpark.Sf, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (s"u:${r.getLong(0)}", s"t:${r.getString(1)}"))
    val adj = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Set[String]]
    ev.foreach { case (u, t) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += t
      adj.getOrElseUpdate(t, scala.collection.mutable.Set.empty) += u
    }
    val dist = scala.collection.mutable.Map("t:click" -> 0L)
    var frontier = Set("t:click")
    for (d <- 1L to 4L) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(n => dist(n) = d)
    }
    val want = dist.values.groupBy(identity).map { case (d, vs) =>
      (d, vs.size.toLong,
        dist.count { case (n, dd) => dd == d && n.startsWith("t:") }.toLong)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want, s"got=${got.toSeq} want=$want")
    assert(got.head == ((0L, 1L, 1L)), "seed node at distance 0")
  }

  test("ts_holt_linear: recurrence matches a pure-Scala fold and the " +
      "forecast extrapolates the final state") {
    val got = SparkEntry.queries("ts_holt_linear")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    assert(got.length == 5, "one series per region")
    got.foreach { case (_, l, b, f) =>
      assert(f == l + 3 * b, "forecast3 = level + 3*trend")
    }
    // recompute one region end-to-end from the raw tables
    val months = T(spark, TestSpark.Sf, "orders")
      .join(T(spark, TestSpark.Sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(T(spark, TestSpark.Sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(T(spark, TestSpark.Sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === got.head._1)
      .groupBy(trunc(col("o_orderdate"), "MM").as("m"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    // global month bounds (all regions, as the op defines the spine)
    val all = T(spark, TestSpark.Sf, "orders")
      .agg(min(trunc(col("o_orderdate"), "MM")),
        max(trunc(col("o_orderdate"), "MM"))).first()
    val (lo, hi) = (all.getDate(0).toLocalDate, all.getDate(1).toLocalDate)
    val ys = Iterator.iterate(lo)(_.plusMonths(1)).takeWhile(!_.isAfter(hi))
      .map(m => months.getOrElse(m, 0L)).toSeq
    var l = ys.head; var b = 0L
    ys.tail.foreach { y =>
      val l2 = math.floor((y + l + b) / 2.0 + 0.5).toLong
      b = math.floor((l2 - l + b) / 2.0 + 0.5).toLong
      l = l2
    }
    assert(got.head._2 == l && got.head._3 == b,
      s"region ${got.head._1}: got (${got.head._2},${got.head._3}) want ($l,$b)")
  }

  test("sql_order_by_all orders by the full select list") {
    val got = SparkEntry.queries("sql_order_by_all")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.toSeq == got.toSeq.sorted, "sorted by (status, priority, n)")
    assert(got.map(_._3).sum ==
      T(spark, TestSpark.Sf, "orders").count())
  }

  test("join_runtime_bloom: bloom-injected plan, same result as the " +
      "plain join") {
    val got = SparkEntry.queries("join_runtime_bloom")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = T(spark, TestSpark.Sf, "lineitem")
      .join(T(spark, TestSpark.Sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") < lit("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice"), 2))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }
}
