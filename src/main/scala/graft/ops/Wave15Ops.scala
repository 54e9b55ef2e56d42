package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 15: warehouse/audit analytics that compose existing
  * primitives into the shapes users actually ask for.
  *
  *  - `join_scd2_pointintime`: fact rows joined to the dimension state
  *    VALID AT their timestamp — the standard SCD2 lookup, as a keyed
  *    equi-join plus interval predicate (never a cross/range join).
  *  - `events_rfm_segments`: recency/frequency/monetary quintile
  *    segmentation with THRESHOLD-based quintiles (exact interpolated
  *    percentile cutoffs on a one-row broadcast) — no global ntile
  *    sort, so it scales where rank-based scoring wouldn't.
  *  - `agg_weighted_median`: exact weighted median per group via the
  *    cumulative-weight window (partition-bounded sort).
  *  - `events_cohort_ltv`: signup-week cohorts × account age, average
  *    cumulative value per user — the LTV triangle.
  *  - `stats_benford_digits`: leading-digit distribution vs Benford's
  *    law with the chi-square distance — the classic audit screen.
  */
object Wave15Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "join_scd2_pointintime",
      // point-in-time lookup: each purchase joins the user-state run
      // that COVERS its timestamp. The SCD2 intervals come from the
      // same run-length build as `dim_scd2`; the join is an equi-join
      // on user_id (co-partitioned shuffle) with the interval predicate
      // applied as a post-join filter — per-user interval counts are
      // small, so the filter is cheap and no range-join machinery is
      // needed. Ties: an event AT valid_from belongs to the new state.
      (s, dir) => {
        val ev = T(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val dim = ev
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
          .select(col("user_id"), col("event_type").as("state"),
            col("ts").as("valid_from"),
            lead("ts", 1).over(w).as("valid_to"))
        val facts = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("value"))
        facts.join(dim, Seq("user_id"))
          .filter(col("ts") >= col("valid_from") &&
            (col("valid_to").isNull || col("ts") < col("valid_to")))
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).cast("timestamp_ntz")
              .as("at"),
            col("state"), dround(col("value"), 2).as("value"))
          .orderBy("event_id")
      },
      Some(
        "WITH e AS (SELECT event_id, user_id, event_type, " +
          "CAST(ts AS TIMESTAMP) AS ts, value FROM events), " +
          "c AS (SELECT *, lag(event_type) OVER " +
          "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
          "FROM e), " +
          "dim AS (SELECT user_id, event_type AS state, ts AS " +
          "valid_from, lead(ts) OVER (PARTITION BY user_id ORDER BY " +
          "ts, event_id) AS valid_to FROM c " +
          "WHERE prev_type IS NULL OR prev_type <> event_type) " +
          "SELECT f.event_id, f.user_id, " +
          "date_trunc('second', f.ts) AS at, d.state, " +
          s"${droundSql("f.value", 2)} AS value " +
          "FROM e f JOIN dim d ON f.user_id = d.user_id " +
          "AND f.ts >= d.valid_from " +
          "AND (d.valid_to IS NULL OR f.ts < d.valid_to) " +
          "WHERE f.event_type = 'purchase' ORDER BY f.event_id")
    ),
    Q(
      "events_rfm_segments",
      // RFM segmentation with THRESHOLD quintiles: per-user recency/
      // frequency/monetary, quintile cutoffs from one exact
      // interpolated-percentile aggregate (a 1-row broadcast), scores
      // by comparison. Rank-based ntile would need a global sort; the
      // cutoff formulation is one aggregate + one broadcast join at
      // any scale. Inputs are exact integers, but the INTERPOLATION
      // formula itself can differ by 1 ulp between engines (proven on
      // stats_lift_table at sf0.1) — so value-vs-cutoff comparisons run
      // on the 1e-6 integer grid on both sides, the shared boundary
      // rule that makes a tie at the cutoff land identically.
      (s, dir) => {
        val ev = T(s, dir, "events")
        val anchor = ev.agg(max(col("ts")).as("mx"))
        val rfm = ev.groupBy("user_id").agg(
          datediff(to_date(max(col("ts")).cast("timestamp")),
            to_date(lit("1970-01-01"))).as("lastd"),
          count(lit(1)).as("f"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
          .crossJoin(broadcast(anchor))
          .select(col("user_id"),
            (datediff(to_date(col("mx")), to_date(lit("1970-01-01")))
              - col("lastd")).cast("long").as("r"),
            col("f"), col("cents"))
        def cuts(c: String) = expr(
          s"percentile($c, array(0.2, 0.4, 0.6, 0.8))").as(s"c_$c")
        val th = broadcast(rfm.agg(cuts("r"), cuts("f"), cuts("cents")))
        val g = (c: org.apache.spark.sql.Column) =>
          round(c * 1e6).cast("long")
        def score(v: String, c: String, reverse: Boolean) = {
          val raw = lit(1) +
            (g(col(v)) > g(col(c)(0))).cast("int") +
            (g(col(v)) > g(col(c)(1))).cast("int") +
            (g(col(v)) > g(col(c)(2))).cast("int") +
            (g(col(v)) > g(col(c)(3))).cast("int")
          (if (reverse) lit(6) - raw else raw).cast("long")
        }
        rfm.crossJoin(th)
          .select(col("user_id"),
            score("r", "c_r", reverse = true).as("r_q"),
            score("f", "c_f", reverse = false).as("f_q"),
            score("cents", "c_cents", reverse = false).as("m_q"))
          .orderBy("user_id")
      },
      Some(
        "WITH rfm AS (SELECT user_id, " +
          "CAST(date_diff('day', DATE '1970-01-01', " +
          "CAST(max(CAST(ts AS TIMESTAMP)) AS DATE)) AS BIGINT) " +
          "AS lastd, CAST(count(*) AS BIGINT) AS f, " +
          "sum(CAST(round(value * 100) AS BIGINT)) AS cents " +
          "FROM events GROUP BY user_id), " +
          "a AS (SELECT CAST(date_diff('day', DATE '1970-01-01', " +
          "CAST(max(CAST(ts AS TIMESTAMP)) AS DATE)) AS BIGINT) " +
          "AS anchord FROM events), " +
          "r0 AS (SELECT user_id, anchord - lastd AS r, f, cents " +
          "FROM rfm, a), " +
          "th AS (SELECT quantile_cont(r, [0.2,0.4,0.6,0.8]) AS cr, " +
          "quantile_cont(f, [0.2,0.4,0.6,0.8]) AS cf, " +
          "quantile_cont(cents, [0.2,0.4,0.6,0.8]) AS cm FROM r0), " +
          "gg AS (SELECT user_id, " +
          "CAST(round(r * 1e6) AS BIGINT) AS r, " +
          "CAST(round(f * 1e6) AS BIGINT) AS f, " +
          "CAST(round(cents * 1e6) AS BIGINT) AS cents, " +
          "[CAST(round(cr[1] * 1e6) AS BIGINT), CAST(round(cr[2] * 1e6) AS BIGINT), " +
          "CAST(round(cr[3] * 1e6) AS BIGINT), CAST(round(cr[4] * 1e6) AS BIGINT)] AS cr, " +
          "[CAST(round(cf[1] * 1e6) AS BIGINT), CAST(round(cf[2] * 1e6) AS BIGINT), " +
          "CAST(round(cf[3] * 1e6) AS BIGINT), CAST(round(cf[4] * 1e6) AS BIGINT)] AS cf, " +
          "[CAST(round(cm[1] * 1e6) AS BIGINT), CAST(round(cm[2] * 1e6) AS BIGINT), " +
          "CAST(round(cm[3] * 1e6) AS BIGINT), CAST(round(cm[4] * 1e6) AS BIGINT)] AS cm " +
          "FROM r0, th) " +
          "SELECT user_id, " +
          "CAST(6 - (1 + (r > cr[1])::INT + (r > cr[2])::INT + " +
          "(r > cr[3])::INT + (r > cr[4])::INT) AS BIGINT) AS r_q, " +
          "CAST(1 + (f > cf[1])::INT + (f > cf[2])::INT + " +
          "(f > cf[3])::INT + (f > cf[4])::INT AS BIGINT) AS f_q, " +
          "CAST(1 + (cents > cm[1])::INT + (cents > cm[2])::INT + " +
          "(cents > cm[3])::INT + (cents > cm[4])::INT AS BIGINT) " +
          "AS m_q FROM gg ORDER BY user_id")
    ),
    Q(
      "agg_weighted_median",
      // exact weighted median (by quantity) of unit price per return
      // flag: cumulative-weight window inside each group, first row
      // whose cumulative weight reaches half the total. Integer cents
      // and integer weights everywhere; the window sort is bounded per
      // group. Tie-break on price makes the picked row unique.
      (s, dir) => {
        val li = T(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"),
            round(col("l_quantity")).cast("long").as("wt"))
        val w = Window.partitionBy("flag").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy("flag")
        li.withColumn("cum", sum(col("wt")).over(w))
          .withColumn("tw", sum(col("wt")).over(tot))
          .filter(col("cum") * 2 >= col("tw"))
          .groupBy("flag")
          .agg((min(col("cents")) / 100.0).as("wmedian"),
            max(col("tw")).as("total_wt"))
          .orderBy("flag")
      },
      Some(
        "WITH li AS (SELECT l_returnflag AS flag, " +
          "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents, " +
          "CAST(round(l_quantity) AS BIGINT) AS wt FROM lineitem), " +
          "c AS (SELECT flag, cents, " +
          "sum(wt) OVER (PARTITION BY flag ORDER BY cents " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
          "sum(wt) OVER (PARTITION BY flag) AS tw FROM li) " +
          "SELECT flag, min(cents) / 100.0 AS wmedian, " +
          "CAST(max(tw) AS BIGINT) AS total_wt " +
          "FROM c WHERE cum * 2 >= tw GROUP BY flag ORDER BY flag")
    ),
    Q(
      "events_cohort_ltv",
      // the LTV triangle: users cohorted by FIRST-event week, average
      // cumulative spend per user at each account age (weeks). Two
      // keyed aggregates plus one per-cohort running window — exact
      // integer cents until the final per-user division.
      (s, dir) => {
        val ev = T(s, dir, "events")
        val first = ev.groupBy("user_id")
          .agg(min(col("ts")).as("first_ts"))
          .select(col("user_id"),
            date_trunc("week", col("first_ts")).cast("date")
              .as("cohort"))
        val spend = ev.join(first, Seq("user_id"))
          .groupBy(col("cohort"),
            floor(datediff(to_date(col("ts")),
              col("cohort")) / 7).cast("long").as("age_w"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        val sizes = first.groupBy("cohort")
          .agg(count(lit(1)).as("users"))
        val w = Window.partitionBy("cohort").orderBy("age_w")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spend
          .withColumn("cum_cents", sum(col("cents")).over(w))
          .join(sizes, Seq("cohort"))
          .select(col("cohort"), col("age_w"), col("users"),
            dround(col("cum_cents") / col("users") / 100.0, 4)
              .as("ltv"))
          .orderBy("cohort", "age_w")
      },
      Some(
        "WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, " +
          "value FROM events), " +
          "first AS (SELECT user_id, " +
          "CAST(date_trunc('week', min(ts)) AS DATE) AS cohort " +
          "FROM e GROUP BY user_id), " +
          "spend AS (SELECT f.cohort, " +
          "CAST(floor(date_diff('day', f.cohort, " +
          "CAST(e.ts AS DATE)) / 7) AS BIGINT) AS age_w, " +
          "sum(CAST(round(e.value * 100) AS BIGINT)) AS cents " +
          "FROM e JOIN first f ON e.user_id = f.user_id " +
          "GROUP BY 1, 2), " +
          "sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS users " +
          "FROM first GROUP BY 1), " +
          "cum AS (SELECT cohort, age_w, " +
          "sum(cents) OVER (PARTITION BY cohort ORDER BY age_w " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
          "AS cum_cents FROM spend) " +
          "SELECT c.cohort, c.age_w, s.users, " +
          s"${droundSql("c.cum_cents / s.users / 100.0", 4)} AS ltv " +
          "FROM cum c JOIN sizes s ON c.cohort = s.cohort " +
          "ORDER BY c.cohort, c.age_w")
    ),
    Q(
      "stats_benford_digits",
      // Benford audit: leading-digit distribution of order totals vs
      // log10(1+1/d), with the chi-square distance. Digit extraction
      // on integer cents (string of an exact int, never float
      // formatting); one 9-row aggregate.
      (s, dir) => {
        val d = T(s, dir, "orders")
          .select(substring(round(col("o_totalprice") * 100)
            .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
          .filter(col("digit") >= 1)
        val n = d.agg(count(lit(1)).as("n"))
        d.groupBy("digit").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(n))
          .select(col("digit"), col("cnt"),
            dround(col("cnt").cast("double") / col("n"), 6)
              .as("observed"),
            dround(log10(lit(1) + lit(1.0) / col("digit")), 6)
              .as("benford"),
            dround(
              pow(col("cnt").cast("double") / col("n") -
                log10(lit(1) + lit(1.0) / col("digit")), 2) /
                log10(lit(1) + lit(1.0) / col("digit")) * col("n"), 4)
              .as("chi2_term"))
          .orderBy("digit")
      },
      Some(
        "WITH d AS (SELECT CAST(substring(CAST(CAST(round(" +
          "o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) " +
          "AS BIGINT) AS digit FROM orders), " +
          "f AS (SELECT digit, CAST(count(*) AS BIGINT) AS cnt " +
          "FROM d WHERE digit >= 1 GROUP BY 1), " +
          "n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM f) " +
          "SELECT digit, cnt, " +
          droundSql("CAST(cnt AS DOUBLE) / n", 6) + " AS observed, " +
          droundSql("log10(1 + 1.0 / digit)", 6) + " AS benford, " +
          droundSql("pow(CAST(cnt AS DOUBLE) / n - " +
            "log10(1 + 1.0 / digit), 2) / " +
            "log10(1 + 1.0 / digit) * n", 4) + " AS chi2_term " +
          "FROM f, n ORDER BY digit")
    )
  )
}
