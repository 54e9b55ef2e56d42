package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 35: coordinated sampling.
  *
  * `data_coordinated_sample` is bottom-k-by-hash sampling — the
  * distributed-sampling idiom whose superpower is COORDINATION: ranking
  * every row by a content hash of its KEY (not a per-table RNG) means
  * two tables sampled independently keep the SAME keys, so the samples
  * still join. Here orders and customer are each bottom-1000-sampled by
  * `md5(custkey)`; the op reports the per-segment join of the two
  * samples plus the coordination rate (sampled orders whose customer
  * also survived — high by construction, impossible with independent
  * Bernoulli samples). md5 ranks identically in both engines, so the
  * whole pipeline is oracle-exact. One window per table on the hash
  * rank — no global shuffle beyond the rank's single key family.
  */
object Wave35Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "data_coordinated_sample",
      (s, dir) => {
        // two-stage bottom-k (mergeable): shard-local bottom-k first, so
        // the only unpartitioned rank runs over ≤ 64·k survivors — never
        // the table
        // uid = the table's unique key, breaking rank ties among rows
        // that share the SAMPLING key (several orders per customer)
        def bottomK(df: org.apache.spark.sql.DataFrame, key: String,
            uid: String, k: Int) =
          df.withColumn("h", md5(col(key).cast("string")))
            .withColumn("salt", pmod(xxhash64(col(key)), lit(64)))
            .withColumn("r1", row_number().over(Window
              .partitionBy("salt").orderBy(col("h"), col(uid))))
            .filter(col("r1") <= k)
            .withColumn("rk", row_number().over(
              Window.orderBy(col("h"), col(uid))))
            .filter(col("rk") <= k).drop("h", "salt", "r1", "rk")
        val cs = bottomK(T(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")), "c_custkey",
          "c_custkey", 1000)
        val os = bottomK(T(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice")), "o_custkey", "o_orderkey", 1000)
        // same hash family + same key domain → the sampled custkey sets
        // coincide; the join of the two samples is a faithful sample of
        // the join
        os.join(cs, col("o_custkey") === col("c_custkey"), "left")
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_orders"),
            countDistinct("o_custkey").as("n_custs"),
            dsum(col("o_totalprice"), 2).as("revenue"))
          .orderBy(col("c_mktsegment").asc_nulls_first)
      },
      Some(
        "WITH cs AS (SELECT c_custkey, c_mktsegment FROM (" +
          "SELECT c_custkey, c_mktsegment, row_number() OVER (" +
          "ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rk " +
          "FROM customer) WHERE rk <= 1000), " +
          "os AS (SELECT o_orderkey, o_custkey, o_totalprice FROM (" +
          "SELECT o_orderkey, o_custkey, o_totalprice, row_number() " +
          "OVER (ORDER BY md5(CAST(o_custkey AS VARCHAR)), o_orderkey) " +
          "AS rk FROM orders) WHERE rk <= 1000) " +
          "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, " +
          "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs, " +
          dsumSql("o_totalprice", 2) + " AS revenue " +
          "FROM os LEFT JOIN cs ON o_custkey = c_custkey " +
          "GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST")
    )
  )
}
