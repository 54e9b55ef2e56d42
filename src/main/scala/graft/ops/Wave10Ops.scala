package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det.{dsum, dsumSql}
import graft.sources.SnapTable
import org.apache.spark.sql.functions._

/** Round-4 wave 10: the remaining drift/significance statistics and the
  * table RESTORE verb.
  *
  *  - `stats_psi_drift`: Population Stability Index between the purchase
  *    and click value distributions over 10 fixed bins —
  *    Σ (p−q)·ln(p/q) with Laplace-smoothed bin shares so empty bins are
  *    defined. Bin counts are BIGINT; each bin's term is quantized to 1e9
  *    and integer-summed (partial-agg-order-proof, the chi² trick).
  *  - `stats_ttest_welch`: Welch's t statistic for the mean difference
  *    between the same two samples. Moments come from integer cent sums
  *    (value·100 is integral in the fixtures), so both engines evaluate
  *    ONE identical double formula at the end.
  *  - `table_restore`: Delta-style RESTORE — re-commit an old snapshot's
  *    file list as the new head. Nothing is copied: rollback is a
  *    manifest write, and the bad commit stays in history for audit.
  */
object Wave10Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "stats_psi_drift",
      (s, dir) => {
        val ev = T(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("value"),
            (col("event_type") === "purchase").as("is_a"))
        val mm = ev.agg(min("value"), max("value")).collect()(0)
        val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
        val width = math.max((hi - lo) / 10.0, 1e-9)
        val binned = ev
          .withColumn("bin",
            least(floor((col("value") - lo) / width).cast("long"), lit(9L)))
          .groupBy("bin")
          .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
            sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
        val tot = ev.agg(
          sum(when(col("is_a"), 1L).otherwise(0L)),
          sum(when(!col("is_a"), 1L).otherwise(0L))).collect()(0)
        val (n1, n2) = (tot.getLong(0), tot.getLong(1))
        // Laplace smoothing: (c+1)/(n+10) keeps ln defined on empty bins;
        // the per-bin term is quantized then integer-summed
        val p = (col("ca") + 1).cast("double") / (n1 + 10).toDouble
        val q = (col("cb") + 1).cast("double") / (n2 + 10).toDouble
        binned
          .select((round((p - q) * log(p / q) * 1e9).cast("long"))
            .as("term"))
          .agg(count(lit(1)).as("n_bins"),
            (sum("term") / 1e9).as("psi_raw"))
          .select(col("n_bins"),
            (round(col("psi_raw") * 1e6) / 1e6).as("psi"))
      },
      Some(
        "WITH ev AS (SELECT value, event_type = 'purchase' AS is_a " +
          "FROM events WHERE event_type IN ('purchase', 'click')), " +
          "mm AS (SELECT min(value) AS lo, " +
          "greatest((max(value) - min(value)) / 10.0, 1e-9) AS w FROM ev), " +
          "t AS (SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n1, " +
          "sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS n2 FROM ev), " +
          "b AS (SELECT least(CAST(floor((value - (SELECT lo FROM mm)) " +
          "/ (SELECT w FROM mm)) AS BIGINT), 9) AS bin, " +
          "sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca, " +
          "sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS cb " +
          "FROM ev GROUP BY 1), " +
          "terms AS (SELECT CAST(round(" +
          "(CAST(ca + 1 AS DOUBLE) / ((SELECT n1 FROM t) + 10) - " +
          "CAST(cb + 1 AS DOUBLE) / ((SELECT n2 FROM t) + 10)) * " +
          "ln((CAST(ca + 1 AS DOUBLE) / ((SELECT n1 FROM t) + 10)) / " +
          "(CAST(cb + 1 AS DOUBLE) / ((SELECT n2 FROM t) + 10))) * 1e9) " +
          "AS BIGINT) AS term FROM b) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_bins, " +
          "round(sum(term) / 1e9 * 1e6) / 1e6 AS psi FROM terms")
    ),
    Q(
      "stats_ttest_welch",
      (s, dir) => {
        val m = T(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .groupBy((col("event_type") === "purchase").as("is_a"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("sc"),
            sum(round(col("value") * 100).cast("long") *
              round(col("value") * 100).cast("long")).as("ssq"))
          .collect().map(r => r.getBoolean(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        val (na, sa, qa) = m(true)
        val (nb, sb, qb) = m(false)
        // one closed-form double expression from six BIGINTs — the same
        // literal arithmetic lands in the oracle text below
        def mean(sc: Long, n: Long) = sc.toDouble / n / 100.0
        def variance(sc: Long, q2: Long, n: Long) =
          (q2.toDouble - sc.toDouble * sc / n) / (n - 1) / 10000.0
        val t = (mean(sa, na) - mean(sb, nb)) /
          math.sqrt(variance(sa, qa, na) / na + variance(sb, qb, nb) / nb)
        val one = T(s, dir, "events").limit(1)
        one.select(lit(na).as("n_a"), lit(nb).as("n_b"),
          lit(math.round(t * 1e6) / 1e6).as("t_welch"))
      },
      Some(
        "WITH m AS (SELECT event_type = 'purchase' AS is_a, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc, " +
          "CAST(sum(CAST(round(value * 100) AS BIGINT) * " +
          "CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ssq " +
          "FROM events WHERE event_type IN ('purchase', 'click') " +
          "GROUP BY 1), " +
          "a AS (SELECT * FROM m WHERE is_a), " +
          "b AS (SELECT * FROM m WHERE NOT is_a) " +
          "SELECT a.n AS n_a, b.n AS n_b, " +
          "round((CAST(a.sc AS DOUBLE) / a.n / 100.0 - " +
          "CAST(b.sc AS DOUBLE) / b.n / 100.0) / " +
          "sqrt((CAST(a.ssq AS DOUBLE) - CAST(a.sc AS DOUBLE) * a.sc / a.n) " +
          "/ (a.n - 1) / 10000.0 / a.n + " +
          "(CAST(b.ssq AS DOUBLE) - CAST(b.sc AS DOUBLE) * b.sc / b.n) " +
          "/ (b.n - 1) / 10000.0 / b.n) * 1e6) / 1e6 AS t_welch " +
          "FROM a, b")
    ),
    Q(
      "agg_decimal_exact",
      // exact money aggregation in DECIMAL — the path Det.dsum's scaladoc
      // points to beyond int64 range: sums are exact and associative at
      // ANY scale (no rounding contract needed), at the cost of decimal
      // arithmetic instead of codegen'd longs. avg is re-derived from
      // sum/count so both engines divide once, identically.
      (s, dir) => {
        val li = T(s, dir, "lineitem")
          .select(col("l_returnflag"),
            col("l_extendedprice").cast("decimal(12,2)").as("p"))
        li.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("p")).cast("decimal(38,2)").as("total"),
            (sum(col("p")) / count(lit(1))).cast("decimal(38,6)").as("avg_p"))
          .orderBy("l_returnflag")
      },
      Some(
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) " +
          "AS DECIMAL(38,2)) AS total, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) / count(*) " +
          "AS DECIMAL(38,6)) AS avg_p " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    ),
    Q(
      "table_restore",
      // RESTORE: an append lands bad data; restore(v1) re-commits v1's
      // file list as v3 — no data movement, full audit trail (v2 remains
      // in history until vacuum). The read after restore must equal v1.
      (s, dir) => {
        val root = graft.Tmp.dir("graft_snaptab")
        val o = T(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        SnapTable.create(s, root,
          o.repartitionByRange(4, col("o_orderkey")), "o_orderkey")
        SnapTable.append(s, root, // the "bad batch": corrupted prices
          o.limit(500).withColumn("o_totalprice", lit(-1.0)))
        SnapTable.restore(s, root, 1)
        SnapTable.read(s, root)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))
          .orderBy("o_orderstatus")
      },
      Some(
        "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("o_totalprice", 2) + " AS total FROM orders " +
          "GROUP BY o_orderstatus ORDER BY o_orderstatus")
    )
  )
}
