package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 50: equivalence testing, agreement, likelihood-ratio
  * independence, and distribution-free median intervals.
  *
  *  - `stats_tost_equivalence`: two one-sided t-tests (Schuirmann's
  *    TOST) on mean order value, high-priority vs other orders, with
  *    a ±5%-of-pooled-mean margin. Same sufficient-statistics shape as
  *    `stats_ttest_welch`: one grouped aggregate to six BIGINTs
  *    (cent-scaled sums / squares — exact and associative), then one
  *    closed-form double expression per statistic. Equivalence is
  *    declared when BOTH one-sided stats clear the normal 0.95
  *    critical value (df is ~n, the t quantile is z to 4 decimals).
  *  - `stats_cohens_kappa`: inter-rater agreement between the true
  *    priority class and wave 49's noisy surrogate predictor, from one
  *    (true, pred) contingency aggregate. Both the observed-agreement
  *    and chance-agreement numerators stay INTEGER (N·Σdiag and
  *    Σ row·col marginal products), so kappa is one exact integer
  *    ratio — associative at any scale (switch to DECIMAL past ~1e9
  *    rows, same note as ml_auc_roc).
  *  - `stats_g_test`: likelihood-ratio G-test of lang × source
  *    independence over documents — G = 2·Σ O·ln(O/E) with E from the
  *    broadcast marginals; per-cell doubles are 1e6-scaled to integers
  *    before the final sum (dsum) so partial-agg order cannot flap the
  *    statistic. Cell space is |langs|×|sources| — bounded.
  *  - `stats_median_ci`: exact median plus the distribution-free
  *    binomial(n, ½) confidence interval via order statistics, on the
  *    dollar-quantized order-value domain: groupBy dollar bucket,
  *    ONE cumulative window over ≤|price-domain| buckets (bounded by
  *    the value range, not the row count), then the three target ranks
  *    are picked with conditional-min aggregates — no global per-row
  *    sort anywhere.
  */
object Wave50Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "stats_tost_equivalence",
      (s, dir) => {
        val g = T(s, dir, "orders")
          .groupBy(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .as("is_a"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("sc"),
            // the squared-cents SUM outgrows BIGINT right past sf0.01
            // (~1.5e7 cents² ≈ 2e14/row × 150k rows ≈ 3e19 > 2^63 —
            // found by the sf0.1 bonus sweep): sum in DECIMAL(38,0),
            // exact and associative like the agg_stats power sums; the
            // per-row product still fits a long and the oracle's
            // HUGEINT sum converts to double identically
            sum((round(col("o_totalprice") * 100).cast("long") *
              round(col("o_totalprice") * 100).cast("long"))
              .cast("decimal(38,0)")).as("ssq"))
        val a = g.filter(col("is_a")).select(col("n").as("na"),
          col("sc").as("sa"), col("ssq").as("qa"))
        val b = g.filter(!col("is_a")).select(col("n").as("nb"),
          col("sc").as("sb"), col("ssq").as("qb"))
        val ma = col("sa").cast("double") / col("na") / 100.0
        val mb = col("sb").cast("double") / col("nb") / 100.0
        val va = (col("qa").cast("double") -
          col("sa").cast("double") * col("sa") / col("na")) /
          (col("na") - 1) / 10000.0
        val vb = (col("qb").cast("double") -
          col("sb").cast("double") * col("sb") / col("nb")) /
          (col("nb") - 1) / 10000.0
        val se = sqrt(va / col("na") + vb / col("nb"))
        val pooled = (col("sa") + col("sb")).cast("double") /
          (col("na") + col("nb")) / 100.0
        val delta = pooled * 0.05
        val diff = ma - mb
        val tLower = (diff + delta) / se
        val tUpper = (diff - delta) / se
        a.crossJoin(b)
          .select(col("na").as("n_a"), col("nb").as("n_b"),
            dround(diff, 4).as("mean_diff"),
            dround(delta, 4).as("margin"),
            dround(tLower, 4).as("t_lower"),
            dround(tUpper, 4).as("t_upper"),
            (tLower > 1.6449 && tUpper < -1.6449).as("equivalent"))
      },
      Some(
        "WITH m AS (SELECT o_orderpriority IN ('1-URGENT', '2-HIGH') " +
          "AS is_a, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) " +
          "AS BIGINT) AS sc, " +
          // ssq stays HUGEINT (DuckDB's native BIGINT-sum type — the
          // BIGINT cast would overflow past sf0.01 exactly like the
          // Spark side did); it only ever reaches the output through
          // CAST(qa AS DOUBLE), same as Spark's DECIMAL(38,0)
          "sum(CAST(round(o_totalprice * 100) AS BIGINT) * " +
          "CAST(round(o_totalprice * 100) AS BIGINT)) " +
          "AS ssq FROM orders GROUP BY 1), " +
          "a AS (SELECT n AS na, sc AS sa, ssq AS qa FROM m WHERE is_a), " +
          "b AS (SELECT n AS nb, sc AS sb, ssq AS qb FROM m " +
          "WHERE NOT is_a), " +
          "x AS (SELECT na, nb, " +
          "CAST(sa AS DOUBLE) / na / 100.0 - " +
          "CAST(sb AS DOUBLE) / nb / 100.0 AS diff, " +
          "CAST(sa + sb AS DOUBLE) / (na + nb) / 100.0 * 0.05 AS delta, " +
          "sqrt((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) " +
          "/ (na - 1) / 10000.0 / na + " +
          "(CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) " +
          "/ (nb - 1) / 10000.0 / nb) AS se FROM a, b) " +
          "SELECT na AS n_a, nb AS n_b, " +
          droundSql("diff", 4) + " AS mean_diff, " +
          droundSql("delta", 4) + " AS margin, " +
          droundSql("(diff + delta) / se", 4) + " AS t_lower, " +
          droundSql("(diff - delta) / se", 4) + " AS t_upper, " +
          "((diff + delta) / se > 1.6449 AND " +
          "(diff - delta) / se < -1.6449) AS equivalent FROM x")
    ),
    Q(
      "stats_cohens_kappa",
      (s, dir) => {
        val m = ((col("u") * 1000).cast("long") % 5).cast("int")
        val byM = when(m === 0, "1-URGENT").when(m === 1, "2-HIGH")
          .when(m === 2, "3-MEDIUM").when(m === 3, "4-NOT SPECIFIED")
          .otherwise("5-LOW")
        val tp0 = T(s, dir, "orders")
          .select(col("o_orderpriority").as("t"),
            ((col("o_orderkey") * lit(1103515245L) + lit(12345L))
              % lit(2147483647L)).cast("double")
              ./(lit(2147483647.0)).as("u"))
          .select(col("t"), when(col("u") < 0.6, col("t"))
            .otherwise(byM).as("p"))
        val conf = tp0.groupBy("t", "p").agg(count(lit(1)).as("c"))
        val bt = conf.groupBy(col("t").as("cls"))
          .agg(sum("c").as("n_true"))
        val bp = conf.groupBy(col("p").as("cls"))
          .agg(sum("c").as("n_pred"))
        val diagSum = conf.filter(col("t") === col("p"))
          .agg(sum("c").as("d")).select(col("d"))
        val margSum = bt.join(bp, Seq("cls"))
          .agg(sum(col("n_true") * col("n_pred")).as("m"),
            sum("n_true").as("n"))
        margSum.crossJoin(broadcast(diagSum))
          .select(col("n"), col("d").as("n_agree"),
            dround(col("d").cast("double") / col("n"), 6).as("p_o"),
            dround(col("m").cast("double") / col("n") / col("n"), 6)
              .as("p_e"),
            dround((col("n") * col("d") - col("m")).cast("double") /
              (col("n") * col("n") - col("m")), 6).as("kappa"))
      },
      Some(
        "WITH r AS (SELECT o_orderpriority AS t, " +
          "CAST((o_orderkey * 1103515245 + 12345) % 2147483647 " +
          "AS DOUBLE) / 2147483647.0 AS u FROM orders), " +
          "tp0 AS (SELECT t, CASE WHEN u < 0.6 THEN t ELSE " +
          "CASE CAST(floor(u * 1000) AS BIGINT) % 5 " +
          "WHEN 0 THEN '1-URGENT' WHEN 1 THEN '2-HIGH' " +
          "WHEN 2 THEN '3-MEDIUM' WHEN 3 THEN '4-NOT SPECIFIED' " +
          "ELSE '5-LOW' END END AS p FROM r), " +
          "conf AS (SELECT t, p, CAST(count(*) AS BIGINT) AS c " +
          "FROM tp0 GROUP BY 1, 2), " +
          "bt AS (SELECT t AS cls, CAST(sum(c) AS BIGINT) AS n_true " +
          "FROM conf GROUP BY 1), " +
          "bp AS (SELECT p AS cls, CAST(sum(c) AS BIGINT) AS n_pred " +
          "FROM conf GROUP BY 1), " +
          "dg AS (SELECT CAST(sum(c) AS BIGINT) AS d FROM conf " +
          "WHERE t = p), " +
          "mg AS (SELECT CAST(sum(n_true * n_pred) AS BIGINT) AS m, " +
          "CAST(sum(n_true) AS BIGINT) AS n " +
          "FROM bt JOIN bp USING (cls)) " +
          "SELECT n, d AS n_agree, " +
          droundSql("CAST(d AS DOUBLE) / n", 6) + " AS p_o, " +
          droundSql("CAST(m AS DOUBLE) / n / n", 6) + " AS p_e, " +
          droundSql("CAST(n * d - m AS DOUBLE) / (n * n - m)", 6) +
          " AS kappa FROM mg, dg")
    ),
    Q(
      "stats_g_test",
      (s, dir) => {
        val cells = T(s, dir, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("o"))
        val rt = cells.groupBy("lang").agg(sum("o").as("rt"))
        val ct = cells.groupBy("source").agg(sum("o").as("ct"))
        val tot = cells.agg(sum("o").as("n"),
          countDistinct("lang").as("r"),
          countDistinct("source").as("c"))
        cells.join(broadcast(rt), Seq("lang"))
          .join(broadcast(ct), Seq("source"))
          .crossJoin(broadcast(tot))
          .withColumn("term", lit(2.0) * col("o") *
            log(col("o").cast("double") * col("n") /
              (col("rt") * col("ct"))))
          .agg(first("r").as("rr"), first("c").as("cc"),
            count(lit(1)).as("n_cells"), dsum(col("term"), 6).as("g"))
          .select(col("n_cells"),
            ((col("rr") - 1) * (col("cc") - 1)).as("df"), col("g"))
      },
      Some(
        "WITH cells AS (SELECT lang, source, " +
          "CAST(count(*) AS BIGINT) AS o FROM documents GROUP BY 1, 2), " +
          "rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt " +
          "FROM cells GROUP BY 1), " +
          "ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct " +
          "FROM cells GROUP BY 1), " +
          "t AS (SELECT CAST(sum(o) AS BIGINT) AS n, " +
          "CAST(count(DISTINCT lang) AS BIGINT) AS r, " +
          "CAST(count(DISTINCT source) AS BIGINT) AS c FROM cells) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_cells, " +
          "CAST((any_value(r) - 1) * (any_value(c) - 1) AS BIGINT) " +
          "AS df, " +
          dsumSql("2.0 * o * ln(CAST(o AS DOUBLE) * n / (rt * ct))", 6) +
          " AS g " +
          "FROM cells JOIN rt USING (lang) JOIN ct USING (source), t")
    ),
    Q(
      "stats_median_ci",
      (s, dir) => {
        val b = T(s, dir, "orders")
          .groupBy(round(col("o_totalprice")).cast("long").as("v"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = b.agg(sum("cnt").as("n"))
          .select(col("n"), expr("(n + 1) div 2").as("m1"),
            expr("(n + 2) div 2").as("m2"),
            greatest(lit(1L), floor((col("n").cast("double") -
              lit(1.959964) * sqrt(col("n").cast("double"))) / 2)
              .cast("long")).as("klo"),
            least(col("n"), ceil(lit(1.0) +
              (col("n").cast("double") + lit(1.959964) *
                sqrt(col("n").cast("double"))) / 2)
              .cast("long")).as("khi"))
        b.withColumn("c1", sum("cnt").over(w))
          .crossJoin(broadcast(tot))
          .agg(first("n").as("n"),
            min(when(col("c1") >= col("m1"), col("v"))).as("v1"),
            min(when(col("c1") >= col("m2"), col("v"))).as("v2"),
            min(when(col("c1") >= col("klo"), col("v"))).as("ci_lo"),
            min(when(col("c1") >= col("khi"), col("v"))).as("ci_hi"))
          .select(col("n"),
            dround((col("v1") + col("v2")).cast("double") / 2, 2)
              .as("median"),
            col("ci_lo"), col("ci_hi"))
      },
      Some(
        "WITH b AS (SELECT CAST(round(o_totalprice) AS BIGINT) AS v, " +
          "CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY 1), " +
          "t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, " +
          "CAST((sum(cnt) + 1) // 2 AS BIGINT) AS m1, " +
          "CAST((sum(cnt) + 2) // 2 AS BIGINT) AS m2, " +
          "CAST(greatest(1, CAST(floor((CAST(sum(cnt) AS DOUBLE) - " +
          "1.959964 * sqrt(CAST(sum(cnt) AS DOUBLE))) / 2) AS BIGINT)) " +
          "AS BIGINT) AS klo, " +
          "CAST(least(sum(cnt), CAST(ceil(1.0 + " +
          "(CAST(sum(cnt) AS DOUBLE) + 1.959964 * " +
          "sqrt(CAST(sum(cnt) AS DOUBLE))) / 2) AS BIGINT)) AS BIGINT) " +
          "AS khi FROM b), " +
          "c AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ROWS " +
          "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
          "AS c1 FROM b) " +
          "SELECT any_value(n) AS n, " +
          droundSql("CAST(min(CASE WHEN c1 >= m1 THEN v END) + " +
            "min(CASE WHEN c1 >= m2 THEN v END) AS DOUBLE) / 2", 2) +
          " AS median, " +
          "CAST(min(CASE WHEN c1 >= klo THEN v END) AS BIGINT) " +
          "AS ci_lo, " +
          "CAST(min(CASE WHEN c1 >= khi THEN v END) AS BIGINT) " +
          "AS ci_hi FROM c, t")
    )
  )
}
