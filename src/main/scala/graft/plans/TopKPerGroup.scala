package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension: top-k rows per group as a FIRST-CLASS plan
  * node, following the custom-operator preference order in SURVEY §2 —
  * compose > Expression > LogicalPlan+Strategy+SparkPlan — this is the (c)
  * tier, used because the composed formulation (window rank + filter)
  * must materialize and SORT every group in full before filtering.
  *
  * Physical design (the 100 TB story): two-phase, like a partial
  * aggregate —
  *   1. a map-side pass keeps a bounded k-row heap per group per
  *      partition (memory O(groups × k), no sort, no spill),
  *   2. a merge pass after a hash exchange on the group keys does the
  *      same over the partial winners.
  * Shuffle volume is ≤ groups × k rows per upstream partition, vs ALL
  * rows for the window formulation; there is no full sort anywhere.
  *
  * Relation to Spark's built-in: since 3.5 Catalyst rewrites the
  * `row_number window + filter rn<=k` idiom through `WindowGroupLimit`,
  * which also limits before the exchange BUT sorts each partition on
  * both sides. This operator replaces the two local sorts
  * (O(n log n), spillable) with bounded heaps (O(n log k), fixed
  * memory) — the difference matters when partitions are large and k is
  * small, the common top-k-per-entity shape. An optimizer `Rule` that
  * rewrites the window idiom to this node would DUPLICATE the built-in
  * coverage, so the operator is exposed as an explicit API instead.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroup = copy(child = newChild)
}

/** The physical operator; `global = false` is the pre-shuffle partial
  * pass, `global = true` requires clustering on the group keys (Spark
  * inserts the exchange) and produces the final per-group winners.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    global: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (global) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  override def outputPartitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    // locals only — capturing `this` would drag the plan tree into the
    // task closure (not serializable)
    val localGroup = groupExprs
    val localOrder = sortOrder
    val localSchema = child.output
    val localK = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(localGroup, localSchema)
      val ord = GenerateOrdering.generate(localOrder, localSchema)
      // max-heap of size k per group: head is the current WORST kept row,
      // evicted when a better one arrives — O(n log k), bounded memory
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          -ord.compare(a, b)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[InternalRow](localK, worstFirst)
          heaps.put(key.copy(), pq)
        }
        if (pq.size() < localK) pq.add(row.copy())
        else if (ord.compare(row, pq.peek()) < 0) {
          pq.poll()
          pq.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}

/** Planner rule: logical TopKPerGroup → partial exec + exchange + final
  * exec (the exchange comes from the final node's required distribution).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, global = true,
        TopKPerGroupExec(g, o, k, global = false, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Public API. */
object TopK {
  /** Top-k rows of `df` per group, ranked by `order` — (column, ascending)
    * pairs; include a unique tiebreaker column for deterministic output.
    * (Plain column names, not `Column`s: Spark 4 Columns carry lazily
    * resolved ColumnNode wrappers that can't ride to executors.)
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val sortOrder = order.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute(name),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    val plan = TopKPerGroup(
      groupCols.map(UnresolvedAttribute(_)), sortOrder, k,
      df.queryExecution.analyzed)
    org.apache.spark.sql.graftx.Bridge.ofRows(spark, plan)
  }

  /** Idempotently add the planner strategy to the session. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = cur :+ TopKStrategy
    }
  }
}
