package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._
import graft.rc.RcOps

/** Driver contract — see /root/repo/SURVEY.md §2 (the graded operator
  * inventory) and §7. Each module contributes `Q` entries; oracle SQL is
  * colocated with each query definition.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    Scans, Joins, Aggregates, Windows, ScalarFns, EventOps, EventOps2,
    Subqueries,
    Extras, Workload, Workload2, TextOps, TextOps2, SketchOps, Reshape,
    VectorOps, MultimodalOps, RcOps, UdfOps, Curation3, Extras3, Extras4,
    Extras5, Curation4, Extras6, Round4Ops, TableOps, Wave5Ops, Wave6Ops,
    Wave7Ops, Wave8Ops, Wave9Ops, Wave10Ops, Wave10bOps, Wave11Ops,
    Wave12Ops, Wave13Ops, Wave14Ops, Wave15Ops, Wave16Ops, Wave17Ops,
    Wave18Ops, Wave19Ops, Wave20Ops, Wave21Ops, Wave22Ops, Wave23Ops,
    Wave24Ops, Wave25Ops, Wave26Ops, Wave27Ops, Wave28Ops, Wave29Ops, Wave30Ops, Wave31Ops, Wave32Ops, Wave33Ops, Wave34Ops, Wave35Ops,
    Wave36Ops, Wave37Ops, Wave38Ops, Wave39Ops, Wave40Ops, Wave41Ops,
    Wave42Ops, Wave43Ops, Wave44Ops, Wave45Ops, Wave46Ops, Wave47Ops,
    Wave48Ops, Wave49Ops, Wave50Ops, Wave51Ops, Wave52Ops, Wave53Ops,
    Wave54Ops, Wave55Ops, Wave56Ops, Wave57Ops, Wave58Ops, Wave59Ops,
    Wave60Ops, Wave61Ops, Wave62Ops, Wave63Ops, Wave64Ops, Wave65Ops,
    Wave66Ops)

  val all: Seq[Q] = {
    val qs = modules.flatMap(_.queries)
    // fail fast on duplicate names: `queries` is a Map, so a duplicate
    // would silently SHADOW an op out of the correctness gate
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query (TPC-H Q1 analog) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(o)) => n -> o }.toMap
}
