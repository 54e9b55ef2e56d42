package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY §2.11 — user-defined function surface: scalar UDF, typed UDAF
  * (Aggregator), and the generator (UDTF) path.
  *
  * Scale notes: the scalar UDF deliberately exercises the UDF codepath (it
  * black-boxes Catalyst — no pushdown through it, breaks codegen); the
  * equivalent built-in CASE expression in `fn_case_cast` is the production
  * form — a custom Catalyst Expression with doGenCode is the upgrade path
  * when a real extension is hot. The Aggregator is algebraic (partial
  * merge), so it scales like any built-in agg.
  */
object UdfOps extends QueryModule {

  /** Geometric mean via sum-of-logs — mergeable partial state. */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + math.log(a), b._2 + 1L)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Long)): Double = math.exp(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def queries: Seq[Q] = Seq(
    Q(
      "udf_scalar",
      (s, dir) => {
        val tier = udf((d: Double) =>
          if (d < 100000) "low" else if (d < 300000) "mid" else "high")
        T(s, dir, "orders")
          .select(col("o_orderkey"),
            tier(col("o_totalprice")).as("price_tier"))
          .orderBy("o_orderkey")
      },
      Some(
        "SELECT o_orderkey, CASE WHEN o_totalprice < 100000 THEN 'low' " +
          "WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS price_tier " +
          "FROM orders ORDER BY o_orderkey")
    ),
    Q(
      "udaf_typed",
      (s, dir) => {
        val gm = udaf(GeoMean)
        T(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(gm(col("l_quantity")), 6).as("geo_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some(
        "SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geo_qty, " +
          "CAST(count(*) AS BIGINT) AS n FROM lineitem " +
          "GROUP BY l_returnflag ORDER BY l_returnflag")
    ),
    Q(
      "udtf_explode",
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("lang", "tok")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "tok"),
      Some(
        "SELECT lang, tok, CAST(count(*) AS BIGINT) AS n FROM " +
          "(SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents) t " +
          "GROUP BY lang, tok ORDER BY lang, tok")
    )
  )
}
