package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Round-7 wave 32: semantic deduplication (SemDeDup-style).
  *
  * `vec_semdedup` is cluster-scoped embedding near-dup removal: assign
  * every vector to its nearest of 16 deterministic centroids (the
  * lowest-id embeddings), then drop any vector that has a LOWER-id
  * neighbor with cosine > 0.3 in the SAME cell. The cells bound the
  * quadratic — the pairwise join is per-cell, never global, which is the
  * published SemDeDup recipe for web-scale corpora (cluster first, then
  * pairwise only within ε-clusters; cell count scales with corpus size
  * to hold the per-cell pair budget flat).
  *
  * Cross-engine determinism: all geometry runs on a 1e7 integer grid
  * (per-element `round(x·1e7)` → BIGINT): distances and dot products are
  * exact int64 sums (order-free), and the one double op per pair
  * (dot/√(n²·m²)) happens on identical integers in both engines, rounded
  * to 1e-9 before the threshold compare.
  */
object Wave32Ops extends QueryModule {

  /** The op body, cap-parameterized so CellSplitSpec can force the
    * two-level path at fixture scale (VERDICT-r10 #1). At the default
    * cap the fixture sizes give `sub == 1` and IvfRouting.assignFine
    * short-circuits to the proven single-level plan. */
  private[graft] def semdedupBody(s: org.apache.spark.sql.SparkSession,
      dir: String,
      cap: Long = graft.vec.VecAlgs.BroadcastCellCap)
      : org.apache.spark.sql.DataFrame = {
    val gridded = T(s, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> " +
          "CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT))").as("g"))
    // cellSplit sizing (⌈√n⌉ total cells, coarse layer capped): per-
    // fine-cell population stays ~√n as the table grows, so the within-
    // cell pairwise stage is n·√n work, never n² — n comes from the
    // parquet footers (T.rows), so sizing schedules zero Spark jobs
    val (k, sub) =
      graft.vec.VecAlgs.cellSplit(T.rows(s, dir, "embeddings"), cap)
    val cents = gridded.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("g").as("cg"))
    // nearest (coarse, sub) cell on exact integer L2; ties → lowest id.
    // The second routing layer engages exactly when the coarse layer
    // saturates (sub > 1, n past ~cap²) — below that this IS the
    // single-level plan (scell is a constant-folded literal)
    val cells = graft.vec.IvfRouting.assignFine(gridded, cents, sub)
    // within-FINE-cell pairwise: u < v, cosine on the integer grid
    val dropped = cells.as("u")
      .join(cells.as("v"), col("u.cell") === col("v.cell") &&
        col("u.scell") === col("v.scell") &&
        col("u.vec_id") < col("v.vec_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(u.g, v.g, (a, b) -> a * b), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .withColumn("n2u", expr(
        "aggregate(u.g, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
      .withColumn("n2v", expr(
        "aggregate(v.g, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
      .withColumn("cos", round(col("dot") /
        sqrt(col("n2u").cast("double") * col("n2v").cast("double"))
        * 1e9) / 1e9)
      .filter(col("cos") > 0.3)
      .select(col("v.cell").as("cell"), col("v.scell").as("scell"),
        col("v.vec_id").as("vec_id"))
      .distinct()
    cells.join(dropped.withColumn("drop", lit(1L)),
        Seq("cell", "scell", "vec_id"), "left")
      .groupBy("cell")
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(coalesce(col("drop"), lit(0L))).as("n_dropped"))
      .orderBy("cell")
  }

  def queries: Seq[Q] = Seq(
    Q(
      "vec_semdedup",
      (s, dir) => semdedupBody(s, dir),
      Some(
        "WITH g AS (SELECT vec_id, list_transform(embedding, " +
          "x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS g " +
          "FROM embeddings), " +
          "c AS (SELECT vec_id AS cid, g AS cg FROM g WHERE vec_id < " +
          "LEAST(65536, GREATEST(1, CAST(ceil(sqrt((" +
          "SELECT count(*) FROM embeddings))) AS BIGINT)))), " +
          "cells AS (SELECT vec_id, g, " +
          "(SELECT cid FROM c ORDER BY list_sum(list_transform(" +
          "list_zip(g.g, c.cg), p -> (p[1] - p[2]) * (p[1] - p[2]))), " +
          "cid LIMIT 1) AS cell FROM g), " +
          "pairs AS (SELECT v.cell AS cell, v.vec_id AS vec_id, " +
          "round(list_sum(list_transform(list_zip(u.g, v.g), " +
          "p -> p[1] * p[2])) / sqrt(" +
          "CAST(list_sum(list_transform(u.g, x -> x * x)) AS DOUBLE) * " +
          "CAST(list_sum(list_transform(v.g, x -> x * x)) AS DOUBLE)) " +
          "* 1e9) / 1e9 AS cos " +
          "FROM cells u JOIN cells v ON u.cell = v.cell " +
          "AND u.vec_id < v.vec_id), " +
          "dropped AS (SELECT DISTINCT cell, vec_id FROM pairs " +
          "WHERE cos > 0.3) " +
          "SELECT cells.cell, CAST(count(*) AS BIGINT) AS n_vecs, " +
          "CAST(sum(CASE WHEN dropped.vec_id IS NOT NULL THEN 1 ELSE 0 " +
          "END) AS BIGINT) AS n_dropped " +
          "FROM cells LEFT JOIN dropped ON cells.cell = dropped.cell " +
          "AND cells.vec_id = dropped.vec_id " +
          "GROUP BY cells.cell ORDER BY cells.cell")
    )
  )
}
