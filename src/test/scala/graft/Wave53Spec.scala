package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 53: PIP join, JL projection, Hill tail, hapax ratio. */
class Wave53Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("join_point_in_polygon: ray-cast result matches a local " +
      "java.awt-free winding check for every customer point") {
    val got = SparkEntry.queries("join_point_in_polygon")(
      spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("pid") -> r.getAs[Long]("n_inside")).toMap
    // local reference: same polygons, same ray-cast, plain Scala
    val polys = Seq(
      1 -> Seq((2.001, 0.001), (0.001, 2.001), (-1.999, 0.001),
        (0.001, -1.999)),
      2 -> Seq((-4.499, -4.499), (-1.501, -4.499), (-1.501, -1.501),
        (-4.499, -1.501)),
      3 -> Seq((1.001, 1.001), (4.501, 1.501), (2.501, 4.501)),
      4 -> Seq((3.001, -4.001), (4.501, -2.501), (3.501, -0.501),
        (2.001, -1.001), (1.501, -3.001)))
    def inside(px: Double, py: Double, vs: Seq[(Double, Double)]) = {
      var c = 0
      vs.indices.foreach { i =>
        val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.length)
        if (((y1 > py) != (y2 > py)) &&
          px < x1 + (x2 - x1) * (py - y1) / (y2 - y1)) c += 1
      }
      c % 2 == 1
    }
    val keys = T(spark, TestSpark.Sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val want = polys.map { case (pid, vs) =>
      pid.toLong -> keys.count { k =>
        val py = (k * 53 % 1000) / 100.0 - 5.0
        val px = (k * 211 % 1000) / 100.0 - 5.0
        inside(px, py, vs)
      }.toLong
    }.filter(_._2 > 0).toMap
    assert(got == want)
  }

  test("vec_jl_projection: mean distortion near 1, all pairs audited, " +
      "and the 8-d sketch keeps most pairs within 2x") {
    val r = SparkEntry.queries("vec_jl_projection")(
      spark, TestSpark.Sf).collect().head
    val n = r.getAs[Long]("n_pairs")
    assert(n == 200L * 199 / 2 ||
      n <= 200L * 199 / 2) // do2=0 pairs excluded if any
    val mean = r.getAs[Double]("mean_ratio")
    assert(mean > 0.7 && mean < 1.3, s"JL mean distortion $mean")
    assert(r.getAs[Double]("min_ratio") > 0)
    assert(r.getAs[Double]("within_2x") > 0.8)
  }

  test("stats_powerlaw_hill: alpha > 1, tail is a subset of users, " +
      "and alpha matches a local recomputation") {
    val r = SparkEntry.queries("stats_powerlaw_hill")(
      spark, TestSpark.Sf).collect().head
    assert(r.getAs[Long]("n_tail") <= r.getAs[Long]("n_users"))
    val alpha = r.getAs[Double]("alpha")
    assert(alpha > 1)
    import org.apache.spark.sql.functions._
    val ds = T(spark, TestSpark.Sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("d"))
      .collect().map(_.getAs[Long]("d")).filter(_ >= 10)
    val want = 1.0 + ds.length /
      ds.map(d => math.round(math.log(d / 10.0) * 1e6) / 1e6).sum
    assert(math.abs(alpha - want) < 1e-2)
  }

  test("text_hapax_ratio: vocab >= hapax, ratios in [0,1], token " +
      "totals match the corpus") {
    val rows = SparkEntry.queries("text_hapax_ratio")(
      spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val totalToks = T(spark, TestSpark.Sf, "documents")
      .select(explode(split(col("text"), " "))).count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    rows.foreach { r =>
      assert(r.getAs[Long]("hapax") <= r.getAs[Long]("vocab"))
      val h = r.getAs[Double]("hapax_ratio")
      assert(h >= 0 && h <= 1)
    }
  }
}
