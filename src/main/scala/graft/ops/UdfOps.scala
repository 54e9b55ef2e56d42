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

  /** Geometric mean via sum-of-logs — mergeable partial state. The log sum
    * is kept as a scaled INTEGER (round(ln(x)*1e12)) so the aggregate is
    * associative and immune to partial-merge order (a raw double sum is
    * not run-stable — Det policy in Q.scala). Honest headroom math:
    * int64 holds ~9.2e18, so at |ln(x)·1e12| up to ~4e12 (these fixtures:
    * ln ≤ 4) a group overflows around 2e6 rows; additions are checked
    * (addExact) so exceeding it fails LOUDLY instead of returning
    * exp(wrapped) garbage. The widening path for beyond-int64 groups is a
    * DECIMAL(38,0) buffer — the exact analog of DuckDB's HUGEINT sum the
    * oracle already uses.
    */
  object GeoMean extends Aggregator[Double, (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    // half-away-from-zero, matching Spark round() / DuckDB round()
    private def r0(v: Double): Long =
      (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
    def reduce(b: (Long, Long), a: Double): (Long, Long) =
      (Math.addExact(b._1, r0(math.log(a) * 1e12)), b._2 + 1L)
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (Math.addExact(x._1, y._1), x._2 + y._2)
    def finish(r: (Long, Long)): Double = math.exp(r._1 / 1e12 / r._2)
    def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
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
            graft.Det.dround(gm(col("l_quantity")), 6).as("geo_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      // oracle mirrors the scaled-int log sum exactly (not plain
      // exp(avg(ln)) — see GeoMean's determinism note)
      Some(
        "SELECT l_returnflag, " +
          graft.Det.droundSql(
            "exp(sum(CAST(round(ln(l_quantity) * 1e12) AS BIGINT)) " +
              "/ 1e12 / count(*))", 6) + " AS geo_qty, " +
          "CAST(count(*) AS BIGINT) AS n FROM lineitem " +
          "GROUP BY l_returnflag ORDER BY l_returnflag")
    ),
    Q(
      "udtf_ngrams",
      // CUSTOM Generator (real UDTF): trigrams per language via graft's
      // native ngrams() Catalyst generator — plans through Generate with
      // pruning intact; top-5 per lang by (count desc, trigram)
      (s, dir) => {
        graft.functions.NGramGenerator.register(s)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang")
          .orderBy(col("n").desc, col("ngram"))
        T(s, dir, "documents")
          .select(col("lang"), split(col("text"), " ").as("tk"))
          .select(col("lang"), expr("ngrams(tk, 3)").as("ngram"))
          .groupBy("lang", "ngram")
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .select("lang", "rn", "ngram", "n")
          .orderBy("lang", "rn")
      },
      Some(
        "WITH t AS (SELECT lang, string_split(text, ' ') AS tk " +
          "FROM documents), " +
          "g AS (SELECT lang, unnest(list_transform(range(1, len(tk) - 1), " +
          "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS ngram FROM t), " +
          "c AS (SELECT lang, ngram, CAST(count(*) AS BIGINT) AS n " +
          "FROM g GROUP BY 1, 2), " +
          "r AS (SELECT lang, CAST(row_number() OVER (PARTITION BY lang " +
          "ORDER BY n DESC, ngram) AS BIGINT) AS rn, ngram, n FROM c) " +
          "SELECT lang, rn, ngram, n FROM r WHERE rn <= 5 " +
          "ORDER BY lang, rn")
    ),
    Q(
      "fn_try",
      // ANSI-safe error handling: try_cast on dirty strings, try_divide
      // with zero divisors — NULL instead of job failure, the posture a
      // 100 TB pipeline needs for dirty data
      (s, dir) =>
        T(s, dir, "customer")
          .select(
            col("c_custkey"),
            expr("try_cast(concat(CAST(c_custkey AS STRING), " +
              "CASE WHEN c_custkey % 3 = 0 THEN 'x' ELSE '' END) AS BIGINT)")
              .as("parsed_id"),
            expr("try_divide(c_acctbal, CAST(c_nationkey AS DOUBLE))")
              .as("bal_per_nation"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, " +
          "try_cast(CAST(c_custkey AS VARCHAR) || " +
          "CASE WHEN c_custkey % 3 = 0 THEN 'x' ELSE '' END AS BIGINT) " +
          "AS parsed_id, " +
          "c_acctbal / CAST(c_nationkey AS DOUBLE) AS bal_per_nation " +
          "FROM customer ORDER BY c_custkey")
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
