package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 36: mergeable sketches + experiment statistics.
  *
  *  - `agg_kmv_distinct` is the KMV (k-minimum-values / theta-sketch)
  *    distinct-count estimator — the mergeable bottom-k companion to
  *    HLL: keep the k smallest values of a uniform hash; the kth
  *    smallest normalized hash U(k) estimates distinct ≈ (k−1)/U(k).
  *    Unlike HLL the kept hash SET also supports set algebra (union =
  *    merge bottom-k, intersection via inclusion-exclusion), which is
  *    why production dedup pipelines carry KMV/theta per shard. The
  *    hash is an explicit affine map mod a Mersenne prime so DuckDB
  *    replays it bit-exactly — this op is fully ORACLE-checked, unlike
  *    the seeded-LSH family.
  *  - `agg_hdr_histogram` is the log2-bucketed (HDR-style) histogram:
  *    bucket = bit-length of the integer cent amount — pure integer
  *    arithmetic (`length(bin(x))`, identical in both engines), no
  *    floating log whose last-ulp could flip a boundary value. The
  *    standard latency/money histogram at scale: fixed ~40 buckets
  *    whatever the data, one hash aggregate, merge = vector add.
  *  - `stats_bh_fdr` is the Benjamini–Hochberg FDR procedure over one
  *    two-proportion z-test per nation (order-failure rate vs the
  *    pooled rate), p via the documented logistic approximation of the
  *    normal CDF (Φ(z) ≈ 1/(1+e^(−1.702z))). The multiple-testing
  *    gate every experimentation platform runs; one tiny aggregate per
  *    test + one |tests|-row window.
  *  - `stats_cuped` is CUPED variance reduction: per-customer
  *    pre-period spend as the covariate, θ = cov(X,Y)/var(X) per
  *    segment from exact dollar-integer sums (cast to double only for
  *    the final ratio — both engines combine identical int64 sums with
  *    identical IEEE ops), reporting the variance-reduction percentage
  *    ρ² = θ²·var(X)/var(Y) that CUPED removes.
  *
  * Scale notes: KMV premerges bottom-k per 64-way salt shard before the
  * per-type rank, so no unpartitioned window ever sees more than 64·k
  * rows per type; the histogram and both stats ops are single hash
  * aggregates (the BH window runs over one row per TEST, bounded by the
  * nation count, never the data).
  */
object Wave36Ops extends QueryModule {

  /** Affine hash mod the Mersenne prime 2^31−1, replayable in SQL on
    * both engines: inputs < 2^31 keep a·x+b < 2^62 (no int64 overflow,
    * no ANSI failure). NOT cryptographic — a demo-grade uniformizer.
    */
  private val HashA = 1103515245L
  private val HashB = 12345L
  private val HashP = 2147483647L
  private def kmvHashSql(x: String): String =
    s"($HashA * ($x % $HashP) + $HashB) % $HashP"

  def queries: Seq[Q] = Seq(
    Q(
      "agg_kmv_distinct",
      (s, dir) => {
        val k = 256
        val hashed = T(s, dir, "events")
          .filter(col("user_id").isNotNull) // a null hash would rank
          // below every real one and poison the bottom-k
          .select(col("event_type"),
            expr(kmvHashSql("user_id")).as("h"))
          .distinct() // KMV is over the distinct hash SET
        // two-stage bottom-k (mergeable): shard-local bottom-k first so
        // the per-type rank never sees more than 64·k rows
        val kept = hashed
          .withColumn("salt", pmod(col("h"), lit(64)))
          .withColumn("r1", row_number().over(Window
            .partitionBy("event_type", "salt").orderBy("h")))
          .filter(col("r1") <= k)
          .withColumn("rk", row_number().over(Window
            .partitionBy("event_type").orderBy("h")))
          .filter(col("rk") <= k)
        val sketch = kept.groupBy("event_type")
          .agg(max("h").as("hk"), count(lit(1)).as("n_kept"))
        val exact = hashed.groupBy("event_type")
          .agg(countDistinct("h").as("exact"))
        sketch.join(exact, "event_type")
          .select(col("event_type"), col("exact"),
            // fewer than k distinct → the sketch IS the exact set
            when(col("n_kept") < k, col("n_kept").cast("double"))
              .otherwise(lit((k - 1).toDouble * HashP) / col("hk"))
              .as("est0"))
          .select(col("event_type"), col("exact"),
            dround(col("est0"), 2).as("est"),
            dround(abs(col("est0") - col("exact")) / col("exact"), 4)
              .as("rel_err"))
          .orderBy("event_type")
      },
      Some(
        "WITH h AS (SELECT DISTINCT event_type, " +
          kmvHashSql("user_id") +
          " AS h FROM events WHERE user_id IS NOT NULL), " +
          "r AS (SELECT event_type, h, row_number() OVER " +
          "(PARTITION BY event_type ORDER BY h) AS rk FROM h), " +
          "sk AS (SELECT event_type, max(h) AS hk, " +
          "CAST(count(*) AS BIGINT) AS n_kept FROM r WHERE rk <= 256 " +
          "GROUP BY event_type), " +
          "ex AS (SELECT event_type, CAST(count(DISTINCT h) AS BIGINT) " +
          "AS exact FROM h GROUP BY event_type), " +
          "j AS (SELECT sk.event_type, ex.exact, CASE WHEN n_kept < 256 " +
          s"THEN CAST(n_kept AS DOUBLE) ELSE 255.0 * $HashP / hk END " +
          "AS est0 FROM sk JOIN ex ON sk.event_type = ex.event_type) " +
          "SELECT event_type, exact, " + droundSql("est0", 2) + " AS est, " +
          droundSql("abs(est0 - exact) / exact", 4) + " AS rel_err " +
          "FROM j ORDER BY event_type")
    ),
    Q(
      "agg_hdr_histogram",
      (s, dir) => {
        val w = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val b = T(s, dir, "lineitem")
          .select(round(col("l_extendedprice") * 100).cast("long")
            .as("cents"))
          // bit-length bucket: integer-exact in both engines, no
          // floating log2 whose last ulp could flip 2^k boundaries
          .withColumn("bucket", length(bin(col("cents"))).cast("long"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            (min("cents") / lit(100.0)).as("lo"),
            (max("cents") / lit(100.0)).as("hi"),
            (sum("cents") / lit(100.0)).as("total"))
        // the cumulative window runs over ≤ 64 bucket rows, not data
        b.withColumn("cum_pct",
            dround(sum("n").over(w) * lit(100.0) /
              sum("n").over(Window.partitionBy()), 6))
          .select("bucket", "n", "lo", "hi", "total", "cum_pct")
          .orderBy("bucket")
      },
      Some(
        "WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) " +
          "AS cents FROM lineitem), " +
          "b AS (SELECT CAST(length(bin(cents)) AS BIGINT) AS bucket, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "min(cents) / 100.0 AS lo, max(cents) / 100.0 AS hi, " +
          "CAST(sum(cents) AS BIGINT) / 100.0 AS total " +
          "FROM c GROUP BY 1) " +
          "SELECT bucket, n, lo, hi, total, " +
          droundSql("100.0 * sum(n) OVER (ORDER BY bucket ROWS BETWEEN " +
            "UNBOUNDED PRECEDING AND CURRENT ROW) / sum(n) OVER ()", 6) +
          " AS cum_pct FROM b ORDER BY bucket")
    ),
    Q(
      "stats_bh_fdr",
      (s, dir) => {
        val q = 0.10
        val per = T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(T(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
              .as("x"))
        val pooled = per.agg(
          (sum("x").cast("double") / sum("n")).as("r"))
        val tests = per.crossJoin(broadcast(pooled))
          .withColumn("z",
            (col("x") / col("n") - col("r")) /
              sqrt(col("r") * (lit(1.0) - col("r")) / col("n")))
          // two-sided p via the logistic approximation of Φ:
          // p = 2·(1 − Φ(|z|)) ≈ 2/(1+e^(1.702·|z|)); rounded to 1e-9
          // so a last-ulp exp() difference cannot flip the BH compare
          .withColumn("p",
            dround(lit(2.0) / (lit(1.0) + exp(lit(1.702) * abs(col("z")))),
              9))
        val m = Window.partitionBy()
        val ranked = tests
          .withColumn("i", row_number().over(
            Window.orderBy(col("p"), col("n_name"))).cast("long"))
          .withColumn("m", count(lit(1)).over(m))
          .withColumn("hit",
            when(col("p") <= lit(q) * col("i") / col("m"), col("i")))
          .withColumn("kmax", max("hit").over(m))
        ranked
          .select(col("n_name").as("nation"), col("i"), col("p"),
            (col("i") <= coalesce(col("kmax"), lit(0L))).as("reject"))
          .orderBy("i")
      },
      Some(
        "WITH per AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS x FROM orders " +
          "JOIN customer ON o_custkey = c_custkey " +
          "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name), " +
          "pooled AS (SELECT CAST(sum(x) AS DOUBLE) / sum(n) AS r " +
          "FROM per), " +
          "t AS (SELECT n_name, n, x, " +
          "(CAST(x AS DOUBLE) / n - r) / sqrt(r * (1 - r) / n) AS z " +
          "FROM per, pooled), " +
          "p0 AS (SELECT n_name, " +
          droundSql("2.0 / (1.0 + exp(1.702 * abs(z)))", 9) +
          " AS p FROM t), " +
          "rk AS (SELECT n_name, p, CAST(row_number() OVER " +
          "(ORDER BY p, n_name) AS BIGINT) AS i, " +
          "count(*) OVER () AS m FROM p0), " +
          "km AS (SELECT max(CASE WHEN p <= 0.10 * i / m THEN i END) " +
          "OVER () AS kmax, n_name, i, p FROM rk) " +
          "SELECT n_name AS nation, i, p, " +
          "i <= coalesce(kmax, 0) AS reject FROM km ORDER BY i")
    ),
    Q(
      "stats_cuped",
      (s, dir) => {
        // per-customer pre/post-period spend in exact integer DOLLARS
        // (cents would overflow the cross-product sums at 100 TB; at
        // dollar scale Σxy stays well under int64)
        val per = T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_mktsegment")
          .agg(
            sum(when(col("o_orderdate") < lit("1998-06-01"),
              round(col("o_totalprice")).cast("long")).otherwise(0L))
              .as("x"),
            sum(when(col("o_orderdate") >= lit("1998-06-01"),
              round(col("o_totalprice")).cast("long")).otherwise(0L))
              .as("y"))
        // θ = cov(X,Y)/var(X) per segment from exact integer sums; the
        // final ratios combine identical int64s with identical IEEE ops
        per.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
          // combine in DOUBLE: n·Σxy and Σx·Σy overflow int64 well
          // before 100 TB (and would ANSI-throw); identical int64 sums
          // cast to identical doubles combine with identical IEEE ops
          .withColumn("covxy",
            col("n").cast("double") * col("sxy") -
              col("sx").cast("double") * col("sy"))
          .withColumn("varx",
            col("n").cast("double") * col("sxx") -
              col("sx").cast("double") * col("sx"))
          .withColumn("vary",
            col("n").cast("double") * col("syy") -
              col("sy").cast("double") * col("sy"))
          .select(col("c_mktsegment"), col("n"),
            dround(col("covxy") / col("varx"), 6).as("theta"),
            // ρ² = cov²/(var X · var Y): the variance share CUPED removes
            dround(col("covxy") * col("covxy") /
              (col("varx") * col("vary")) * 100.0, 4)
              .as("var_reduction_pct"))
          .orderBy("c_mktsegment")
      },
      Some(
        "WITH per AS (SELECT c_custkey, c_mktsegment, " +
          "CAST(sum(CASE WHEN o_orderdate < DATE '1998-06-01' THEN " +
          "CAST(round(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS x, " +
          "CAST(sum(CASE WHEN o_orderdate >= DATE '1998-06-01' THEN " +
          "CAST(round(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS y " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY c_custkey, c_mktsegment), " +
          "m AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
          "CAST(sum(x * x) AS BIGINT) AS sxx, " +
          "CAST(sum(y * y) AS BIGINT) AS syy, " +
          "CAST(sum(x * y) AS BIGINT) AS sxy FROM per " +
          "GROUP BY c_mktsegment), " +
          "d AS (SELECT c_mktsegment, n, " +
          "CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS covxy, " +
          "CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS varx, " +
          "CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vary " +
          "FROM m) " +
          "SELECT c_mktsegment, n, " +
          droundSql("covxy / varx", 6) + " AS theta, " +
          droundSql("covxy * covxy / (varx * vary) * 100.0", 4) +
          " AS var_reduction_pct FROM d ORDER BY c_mktsegment")
    )
  )
}
