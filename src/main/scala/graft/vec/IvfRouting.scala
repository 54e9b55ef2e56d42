package graft.vec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared two-level IVF cell assignment on the 1e7 integer grid — the
  * routing machinery `vec_semdedup_2level` proved (ops/Wave54Ops.scala),
  * factored out so the PRODUCTION ops (vec_semdedup, vec_cluster_purity,
  * vec_incremental_semdedup) engage the second layer automatically when
  * `VecAlgs.cellSplit` says the coarse layer saturated (`sub > 1`, i.e.
  * n past ~cap² rows), and stay EXACTLY on their proven single-level
  * plan below it:
  *
  *  - layer 1 ([[assignCoarse]]): nearest of the <= cap BROADCAST
  *    centroids `(cid, cg)` by exact int64 L2, ties to lowest cid — the
  *    only driver-bounded structure.
  *  - layer 2 (inside [[assignFine]], only when sub > 1): each coarse
  *    cell's `sub` lowest-id members become its sub-centroids, kept
  *    DISTRIBUTED and probed by a join on the coarse cell id — never a
  *    second broadcast, because the sub-centroid table is coarse·sub
  *    rows and grows with n.
  *
  * `sub == 1` short-circuits to the single-level plan plus a literal
  * `scell = 1` column (constant-folded by Catalyst): no window, no
  * second join, no extra exchange — CellSplitSpec pins the plan
  * identity AND the engaged path on a forced small cap against the
  * oracle-checked Wave54 twin.
  *
  * Inputs carry `(vec_id BIGINT, g ARRAY<BIGINT>)` plus any `carry`
  * columns to preserve through the assignment (e.g. a class label).
  */
object IvfRouting {

  /** Exact int64 squared L2 between two integer-grid array columns. */
  def d2(a: String, b: String) = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      "CAST(0 AS BIGINT), (acc, v) -> acc + v)")

  /** Layer-1 assignment: `(vec_id, cell, g, carry...)` — nearest of the
    * broadcast `cents (cid, cg)` by exact integer L2, ties lowest cid. */
  def assignCoarse(gridded: DataFrame, cents: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val carryAggs = carry.map(c => first(c).as(c))
    gridded.crossJoin(broadcast(cents))
      .withColumn("d2", d2("g", "cg"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cid"))).as("best"),
        (first("g").as("g") +: carryAggs): _*)
      .select((col("vec_id") +: col("best.cid").as("cell") +:
        col("g") +: carry.map(col)): _*)
  }

  /** The per-coarse-cell sub-centroid table `(cell, scid, sg)`: each
    * cell's `sub` lowest-vec_id members, numbered 1..sub in id order.
    * DISTRIBUTED (coarse·sub rows — grows with n, must not broadcast). */
  def subCentroids(coarseAssigned: DataFrame, sub: Long): DataFrame = {
    val w = Window.partitionBy("cell").orderBy("vec_id")
    coarseAssigned
      .withColumn("scid", row_number().over(w).cast("long"))
      .filter(col("scid") <= sub)
      .select(col("cell"), col("scid"), col("g").as("sg"))
  }

  /** Layer-2 assignment against an EXPLICIT sub-centroid table (the
    * incremental ops probe a NEW batch against the sub-centroids the
    * index was built with, never their own): joins on the coarse cell
    * id, nearest sub-centroid by exact integer L2, ties lowest scid.
    * LEFT join: a row routed to a coarse cell with NO sub-centroids
    * (possible when the index batch has no member in that cell — e.g.
    * an index built after deletions) keeps `scell = 1`, the cell's
    * degenerate sub-cell, instead of silently vanishing from the
    * output. CellSplitSpec pins the pass-through. */
  def assignSub(coarseAssigned: DataFrame, subCents: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val carryAggs = carry.map(c => first(c).as(c))
    coarseAssigned.join(subCents, Seq("cell"), "left")
      .withColumn("d2", d2("g", "sg"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("scid"))).as("best"),
        (first("cell").as("cell") +: first("g").as("g") +:
          carryAggs): _*)
      .withColumn("scell", coalesce(col("best.scid"), lit(1L)))
      .select((col("vec_id") +: col("cell") +: col("scell") +:
        col("g") +: carry.map(col)): _*)
  }

  /** FROZEN routing closure for the incremental/streaming consumers
    * (stream_semdedup_index / stream_semdedup_bootstrap): the coarse
    * centroids — and, past the cap² (`sub > 1`), the sub-centroids
    * derived from the BOOTSTRAP table — are fixed up front, so an
    * incoming batch can never derive its own geometry (the invariant
    * every incremental op pins: identical vectors committed in
    * different batches must land in the same cell). `sub <= 1` stays
    * on the proven coarse plan plus a literal `scell`. */
  def frozenRoute(bootstrap: DataFrame, cents: DataFrame, sub: Long)
      : DataFrame => DataFrame =
    if (sub <= 1L)
      gr => assignCoarse(gr, cents)
        .withColumn("scell", lit(1L))
        .select(col("vec_id"), col("cell"), col("scell"), col("g"))
    else {
      val sc = subCentroids(assignCoarse(bootstrap, cents), sub)
      gr => assignSub(assignCoarse(gr, cents), sc)
    }

  /** Fine assignment: `(vec_id, cell, scell, g, carry...)`. With
    * `sub == 1` this IS the coarse assignment (scell = literal 1, no
    * window, no second join — the proven single-level plan); with
    * `sub > 1` the second routing layer engages as described above. */
  def assignFine(gridded: DataFrame, cents: DataFrame, sub: Long,
      carry: Seq[String] = Nil): DataFrame = {
    val coarse = assignCoarse(gridded, cents, carry)
    if (sub <= 1L)
      coarse.withColumn("scell", lit(1L))
        .select((col("vec_id") +: col("cell") +: col("scell") +:
          col("g") +: carry.map(col)): _*)
    else assignSub(coarse, subCentroids(coarse, sub), carry)
  }
}
