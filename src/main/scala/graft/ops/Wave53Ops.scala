package graft.ops

import graft.{Guard, Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Round-8 wave 53: computational-geometry join, dimensionality
  * reduction, heavy-tail fitting, lexical richness.
  *
  *  - `join_point_in_polygon`: the geospatial containment join —
  *    customers (deterministic modular lat/lon, same scheme as
  *    `join_geo_radius`) against four literal convex polygons via ray
  *    casting: polygons decompose into edges (a tiny broadcast), each
  *    point counts +x-ray crossings per polygon in one aggregate, odd
  *    parity = inside. Polygon vertices sit on a .001 offset grid
  *    while points sit on .01, so a ray can never pass through a
  *    vertex and the strict-inequality crossing test is exact. Scales
  *    as points × edges with the edge side broadcast — the standard
  *    PIP dataflow before r-tree partitioning is warranted.
  *  - `vec_jl_projection`: Johnson-Lindenstrauss sketch — project the
  *    64-d embeddings to 8-d with a deterministic ±1 matrix (sign =
  *    first md5 hex digit of "i_j"; an affine LCG grid is visibly
  *    low-rank here and wrecks the isometry), entirely on the 1e5
  *    integer grid so every projection / distance sum is exact int64
  *    arithmetic (no float-order flap), then audit pairwise-distance
  *    distortion dp²/(k·do²) on a Guard-fenced 200-vector sample.
  *    The projection itself is one map-side transform — at 100 TB the
  *    audit sample stays O(1) while the projection streams.
  *  - `stats_powerlaw_hill`: Hill's maximum-likelihood tail exponent
  *    for the per-user event-count distribution: α = 1 + n/Σln(dᵢ/dmin)
  *    over the dmin=10 tail, log-terms 1e6-scaled to integers before
  *    the sum. One groupBy(user) + one filtered aggregate.
  *  - `text_hapax_ratio`: per-source hapax legomena share (vocabulary
  *    appearing exactly once) — the classic lexical-richness /
  *    boilerplate tell: low hapax ratio means template text. Two
  *    nested token aggregates, both keyed on (source, tok).
  */
object Wave53Ops extends QueryModule {

  /** (pid, x1, y1, x2, y2) edge list of the four literal polygons. */
  private val polyEdges: Seq[(Int, Double, Double, Double, Double)] = {
    val polys: Seq[(Int, Seq[(Double, Double)])] = Seq(
      1 -> Seq((2.001, 0.001), (0.001, 2.001), (-1.999, 0.001),
        (0.001, -1.999)),
      2 -> Seq((-4.499, -4.499), (-1.501, -4.499), (-1.501, -1.501),
        (-4.499, -1.501)),
      3 -> Seq((1.001, 1.001), (4.501, 1.501), (2.501, 4.501)),
      4 -> Seq((3.001, -4.001), (4.501, -2.501), (3.501, -0.501),
        (2.001, -1.001), (1.501, -3.001)))
    polys.flatMap { case (pid, vs) =>
      vs.indices.map { i =>
        val (x1, y1) = vs(i)
        val (x2, y2) = vs((i + 1) % vs.length)
        (pid, x1, y1, x2, y2)
      }
    }
  }

  private def polyEdgesSqlValues: String =
    polyEdges.map { case (p, x1, y1, x2, y2) =>
      s"($p, $x1, $y1, $x2, $y2)"
    }.mkString(", ")

  def queries: Seq[Q] = Seq(
    Q(
      "join_point_in_polygon",
      (s, dir) => {
        import s.implicits._
        val pts = T(s, dir, "customer")
          .select(col("c_custkey").as("id"),
            ((col("c_custkey") * 53 % 1000) / 100.0 - 5.0).as("py"),
            ((col("c_custkey") * 211 % 1000) / 100.0 - 5.0).as("px"))
        val edges = polyEdges.toDF("pid", "x1", "y1", "x2", "y2")
        val total = pts.agg(count(lit(1)).as("n_pts"))
        val crossing = (col("y1") > col("py")) =!=
          (col("y2") > col("py"))
        val hits = col("px") < col("x1") +
          (col("x2") - col("x1")) * (col("py") - col("y1")) /
            (col("y2") - col("y1"))
        pts.crossJoin(broadcast(edges))
          .filter(crossing && hits)
          .groupBy("id", "pid")
          .agg(count(lit(1)).as("n_cross"))
          .filter(col("n_cross") % 2 === 1)
          .groupBy("pid").agg(count(lit(1)).as("n_inside"))
          .crossJoin(broadcast(total))
          .select(col("pid").cast("long").as("pid"), col("n_inside"),
            dround(col("n_inside").cast("double") / col("n_pts"), 6)
              .as("share"))
          .orderBy("pid")
      },
      Some(
        "WITH e AS (SELECT * FROM (VALUES " + polyEdgesSqlValues +
          ") AS t(pid, x1, y1, x2, y2)), " +
          "pts AS (SELECT c_custkey AS id, " +
          "(c_custkey * 53 % 1000) / 100.0 - 5.0 AS py, " +
          "(c_custkey * 211 % 1000) / 100.0 - 5.0 AS px " +
          "FROM customer), " +
          "t AS (SELECT CAST(count(*) AS BIGINT) AS n_pts FROM pts), " +
          "cr AS (SELECT id, pid, CAST(count(*) AS BIGINT) AS n_cross " +
          "FROM pts, e WHERE ((y1 > py) <> (y2 > py)) AND " +
          "px < x1 + (x2 - x1) * (py - y1) / (y2 - y1) " +
          "GROUP BY 1, 2), " +
          "inside AS (SELECT pid, CAST(count(*) AS BIGINT) AS n_inside " +
          "FROM cr WHERE n_cross % 2 = 1 GROUP BY 1) " +
          "SELECT CAST(pid AS BIGINT) AS pid, n_inside, " +
          droundSql("CAST(n_inside AS DOUBLE) / n_pts", 6) +
          " AS share FROM inside, t ORDER BY pid")
    ),
    Q(
      "vec_jl_projection",
      (s, dir) => {
        val sample = T(s, dir, "embeddings").filter(col("vec_id") < 200)
        Guard.quadratic(sample, "vec_jl_projection distortion audit")
        val g = sample.select(col("vec_id"), expr(
          "transform(embedding, x -> " +
            "CAST(round(CAST(x AS DOUBLE) * 1e5) AS BIGINT))").as("g"))
        val proj = g.withColumn("p", expr(
          "transform(sequence(0, 7), j -> " +
            "aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) -> " +
            "acc + element_at(g, i + 1) * (CASE WHEN " +
            "substring(md5(concat(cast(i AS STRING), '_', " +
            "cast(j AS STRING))), 1, 1) < '8' " +
            "THEN 1 ELSE -1 END)))"))
        val a = proj.select(col("vec_id").as("ia"), col("g").as("ga"),
          col("p").as("pa"))
        val b = proj.select(col("vec_id").as("ib"), col("g").as("gb"),
          col("p").as("pb"))
        val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
          .withColumn("do2", expr(
            "aggregate(zip_with(ga, gb, (x, y) -> (x - y) * (x - y)), " +
              "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
          .withColumn("dp2", expr(
            "aggregate(zip_with(pa, pb, (x, y) -> (x - y) * (x - y)), " +
              "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
          .filter(col("do2") > 0)
          .withColumn("ratio",
            col("dp2").cast("double") / (lit(8.0) * col("do2")))
        pairs.agg(count(lit(1)).as("n_pairs"),
            (sum(round(col("ratio") * 1e6).cast("long")) / 1e6 /
              count(lit(1))).as("mr"),
            min(dround(col("ratio"), 6)).as("min_ratio"),
            max(dround(col("ratio"), 6)).as("max_ratio"),
            sum((col("ratio") >= 0.5 && col("ratio") <= 2.0)
              .cast("long")).as("n_ok"))
          .select(col("n_pairs"), dround(col("mr"), 6).as("mean_ratio"),
            col("min_ratio"), col("max_ratio"),
            dround(col("n_ok").cast("double") / col("n_pairs"), 6)
              .as("within_2x"))
      },
      Some(
        "WITH g0 AS (SELECT vec_id, list_transform(embedding, x -> " +
          "CAST(round(CAST(x AS DOUBLE) * 1e5) AS BIGINT)) AS g " +
          "FROM embeddings WHERE vec_id < 200), " +
          "pr AS (SELECT vec_id, g, list_transform(range(8), j -> " +
          "CAST(list_sum(list_transform(range(64), i -> " +
          "g[i + 1] * CASE WHEN substring(md5(CAST(i AS VARCHAR) || " +
          "'_' || CAST(j AS VARCHAR)), 1, 1) < '8' " +
          "THEN 1 ELSE -1 END)) AS BIGINT)) AS p FROM g0), " +
          "pairs AS (SELECT a.vec_id AS ia, b.vec_id AS ib, " +
          "CAST(list_sum(list_transform(range(64), i -> " +
          "(a.g[i + 1] - b.g[i + 1]) * (a.g[i + 1] - b.g[i + 1]))) " +
          "AS BIGINT) AS do2, " +
          "CAST(list_sum(list_transform(range(8), j -> " +
          "(a.p[j + 1] - b.p[j + 1]) * (a.p[j + 1] - b.p[j + 1]))) " +
          "AS BIGINT) AS dp2 " +
          "FROM pr a, pr b WHERE a.vec_id < b.vec_id), " +
          "r AS (SELECT ia, ib, " +
          "CAST(dp2 AS DOUBLE) / (8.0 * do2) AS ratio " +
          "FROM pairs WHERE do2 > 0) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
          droundSql(
            "CAST(sum(CAST(round(ratio * 1e6) AS BIGINT)) AS BIGINT) " +
              "/ 1e6 / count(*)", 6) + " AS mean_ratio, " +
          "min(" + droundSql("ratio", 6) + ") AS min_ratio, " +
          "max(" + droundSql("ratio", 6) + ") AS max_ratio, " +
          droundSql("CAST(sum(CASE WHEN ratio >= 0.5 AND ratio <= 2.0 " +
            "THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6) +
          " AS within_2x FROM r")
    ),
    Q(
      "stats_powerlaw_hill",
      (s, dir) => {
        val deg = T(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("d"))
        val tail = deg.filter(col("d") >= 10)
          .agg(count(lit(1)).as("n_tail"),
            sum(round(log(col("d").cast("double") / 10.0) * 1e6)
              .cast("long")).as("lsum"),
            max("d").as("max_deg"))
        deg.agg(count(lit(1)).as("n_users"))
          .crossJoin(broadcast(tail))
          .select(col("n_users"), col("n_tail"), lit(10L).as("dmin"),
            col("max_deg"),
            dround(lit(1.0) + col("n_tail").cast("double") /
              (col("lsum") / 1e6), 4).as("alpha"))
      },
      Some(
        "WITH deg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS d " +
          "FROM events GROUP BY 1), " +
          "tl AS (SELECT CAST(count(*) AS BIGINT) AS n_tail, " +
          "CAST(sum(CAST(round(ln(CAST(d AS DOUBLE) / 10.0) * 1e6) " +
          "AS BIGINT)) AS BIGINT) AS lsum, " +
          "CAST(max(d) AS BIGINT) AS max_deg FROM deg WHERE d >= 10), " +
          "u AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM deg) " +
          "SELECT n_users, n_tail, CAST(10 AS BIGINT) AS dmin, " +
          "max_deg, " +
          droundSql("1.0 + CAST(n_tail AS DOUBLE) / (lsum / 1e6)", 4) +
          " AS alpha FROM u, tl")
    ),
    Q(
      "text_hapax_ratio",
      (s, dir) => {
        val tk = T(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        val cnt = tk.groupBy("source", "tok").agg(count(lit(1)).as("c"))
        cnt.groupBy("source")
          .agg(sum("c").as("n_tokens"),
            count(lit(1)).as("vocab"),
            sum((col("c") === 1).cast("long")).as("hapax"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            col("hapax"),
            dround(col("hapax").cast("double") / col("vocab"), 6)
              .as("hapax_ratio"))
          .orderBy("source")
      },
      Some(
        "WITH tk AS (SELECT source, unnest(string_split(text, ' ')) " +
          "AS tok FROM documents), " +
          "cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c " +
          "FROM tk GROUP BY 1, 2) " +
          "SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, " +
          "CAST(count(*) AS BIGINT) AS vocab, " +
          "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS hapax, " +
          droundSql("CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) " +
            "AS DOUBLE) / count(*)", 6) + " AS hapax_ratio " +
          "FROM cnt GROUP BY 1 ORDER BY 1")
    )
  )
}
