package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Round-7 wave 31: the Spark-4 ANSI aggregate surfaces (LISTAGG WITHIN
  * GROUP, percentile_cont/disc WITHIN GROUP, the bitmap function family)
  * and the native XML source.
  *
  *  - `agg_listagg_native` pins the ANSI `LISTAGG(expr, sep) WITHIN
  *    GROUP (ORDER BY …)` form added in Spark 4 — ordered string
  *    aggregation as a first-class aggregate (vs the
  *    `concat_ws ∘ array_sort ∘ collect_list` composition that
  *    `agg_string_agg` pins). Same per-group sort cost either way.
  *  - `agg_percentile_within_group` pins `PERCENTILE_CONT` /
  *    `PERCENTILE_DISC … WITHIN GROUP` — the ANSI inverse-distribution
  *    syntax. The oracle restates DISC from first principles (smallest
  *    value whose cume_dist ≥ p) rather than trusting engine-specific
  *    disc conventions to agree.
  *  - `agg_bitmap_native` is Spark's bitmap sketch family
  *    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg
  *    / bitmap_count): EXACT distinct counting as a two-level aggregate
  *    whose partial state is a fixed 4 KB bitmap per (group, bucket) —
  *    the scalable exact-distinct idiom (vs shuffling raw ids). Oracle =
  *    plain COUNT(DISTINCT).
  *  - `source_xml` is the Spark-4 native XML source (spark-xml was
  *    donated into core): write a rowTag-structured document tree, read
  *    it back schema-inferred, and prove the roundtrip by aggregation.
  *    XML is the one ubiquitous enterprise format the source matrix
  *    (csv/json/orc/parquet/binary/log) still lacked.
  */
object Wave31Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "agg_listagg_native",
      (s, dir) => {
        val v = s"nat_lga_${System.nanoTime()}"
        T(s, dir, "nation")
          .join(T(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .createOrReplaceTempView(v)
        s.sql(
          s"SELECT r_name, listagg(n_name, '|') " +
            "WITHIN GROUP (ORDER BY n_name) AS nations, " +
            "listagg(DISTINCT substr(n_name, 1, 1), '') " +
            "WITHIN GROUP (ORDER BY substr(n_name, 1, 1)) AS initials, " +
            s"CAST(count(*) AS BIGINT) AS n FROM $v " +
            "GROUP BY r_name ORDER BY r_name")
      },
      Some(
        "SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) " +
          "AS nations, " +
          "string_agg(DISTINCT substr(n_name, 1, 1), '' " +
          "ORDER BY substr(n_name, 1, 1)) AS initials, " +
          "CAST(count(*) AS BIGINT) AS n " +
          "FROM nation JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY r_name ORDER BY r_name")
    ),
    Q(
      "agg_percentile_within_group",
      // integer cents in → the CONT interpolation is exact in both
      // engines; DISC is restated from its definition in the oracle.
      (s, dir) => {
        val v = s"ord_pwg_${System.nanoTime()}"
        T(s, dir, "orders")
          .select(col("o_orderpriority"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView(v)
        s.sql(
          "SELECT o_orderpriority, " +
            "CAST(count(*) AS BIGINT) AS n, " +
            "round(percentile_cont(0.5) WITHIN GROUP (ORDER BY cents) " +
            "/ 1e2) / 1e0 AS median, " +
            "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents) " +
            s"AS BIGINT) AS p90_disc FROM $v " +
            "GROUP BY o_orderpriority ORDER BY o_orderpriority")
      },
      Some(
        "WITH t AS (SELECT o_orderpriority, " +
          "CAST(round(o_totalprice * 100) AS BIGINT) AS cents " +
          "FROM orders), " +
          "cd AS (SELECT o_orderpriority, cents, " +
          "cume_dist() OVER (PARTITION BY o_orderpriority " +
          "ORDER BY cents) AS cd FROM t) " +
          "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, " +
          "round(quantile_cont(cents, 0.5) / 1e2) / 1e0 AS median, " +
          "(SELECT min(cents) FROM cd WHERE " +
          "cd.o_orderpriority = t.o_orderpriority AND cd >= 0.9) " +
          "AS p90_disc " +
          "FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority")
    ),
    Q(
      "agg_bitmap_native",
      (s, dir) => {
        val v = s"ev_bmn_${System.nanoTime()}"
        T(s, dir, "events").createOrReplaceTempView(v)
        s.sql(
          "SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_users FROM (" +
            "SELECT event_type, bitmap_bucket_number(user_id) AS bkt, " +
            "bitmap_count(bitmap_construct_agg(" +
            "bitmap_bit_position(user_id))) AS cnt " +
            s"FROM $v GROUP BY 1, 2) GROUP BY event_type " +
            "ORDER BY event_type")
      },
      Some(
        "SELECT event_type, " +
          "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users " +
          "FROM events GROUP BY event_type ORDER BY event_type")
    ),
    Q(
      "source_xml",
      (s, dir) => {
        val tmp = graft.Tmp.dir("graft_xml_src")
        T(s, dir, "customer")
          .select("c_custkey", "c_mktsegment", "c_acctbal")
          .write.mode("overwrite")
          .option("rootTag", "customers").option("rowTag", "customer")
          .format("xml").save(tmp)
        s.read.option("rowTag", "customer").format("xml").load(tmp)
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n"),
            dsum(col("c_acctbal"), 2).as("balance"))
          .orderBy("c_mktsegment")
      },
      Some(
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("c_acctbal", 2) + " AS balance FROM customer " +
          "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    )
  )
}
