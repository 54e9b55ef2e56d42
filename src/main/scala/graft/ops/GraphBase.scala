package graft.ops

import graft.{T, Tmp}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once / query-many materialization of the part CO-PURCHASE graph
  * shared by the whole graph family (label propagation, k-core,
  * link prediction, edge stats).
  *
  * Parts are adjacent when they appear in the SAME ORDER at least TWICE
  * (u < v, support >= 2). The support threshold keeps the graph sparse and
  * meaningful: random single co-occurrences — the bulk of all pairs — drop
  * out, exactly the market-basket pruning rule. Pair generation is keyed
  * per order (<= C(items,2) per basket), so the build is linear in orders,
  * never a free self-join.
  *
  * Materialization: the first caller per (JVM, sfDir) pays the basket-pair
  * join ONCE and commits the edge list as parquet; every later graph op
  * probes the materialized file (a column-pruned scan of two int64
  * columns). Before this, each of the family's ops rebuilt the edge base
  * from scratch — the basket join was ~6x redundant across the family and
  * was the bulk of each op's 5 s floor. At 100 TB the same pattern is an
  * edge table maintained as a real table (build job commits, analytics
  * probe): nobody recomputes the graph per query.
  */
object GraphBase {

  // sfDir -> materialized parquet path. Per-JVM: the testdata is immutable
  // per dir, so a previous session's SparkSession lifecycle can't stale it.
  private val built = scala.collection.mutable.Map[String, String]()

  /** The logical edge definition (the build job's plan). */
  def buildEdges(s: SparkSession, dir: String): DataFrame = {
    val li = T(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("wt"))
      .filter(col("wt") >= 2)
      .select("u", "v")
  }

  /** The materialized edge table `(u BIGINT, v BIGINT)`, u < v. */
  def edges(s: SparkSession, dir: String): DataFrame = {
    val path = synchronized {
      built.getOrElseUpdate(dir, {
        val p = Tmp.dir("graph_edges") + "/copurchase"
        buildEdges(s, dir).write.mode("overwrite").parquet(p)
        p
      })
    }
    s.read.parquet(path)
  }

  /** Oracle CTE prefix defining `e(u, v)` — the DuckDB replay of the same
    * edge semantics (the oracle has no materialization; semantics match).
    */
  val edgesSql: String =
    "WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk " +
      "FROM lineitem), " +
      "e AS (SELECT u, v FROM (SELECT a.pk AS u, b.pk AS v, " +
      "count(*) AS wt FROM li a JOIN li b ON a.ok = b.ok " +
      "AND a.pk < b.pk GROUP BY 1, 2) WHERE wt >= 2), "
}
