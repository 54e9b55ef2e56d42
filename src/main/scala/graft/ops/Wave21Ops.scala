package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 21: evaluation tables, data-quality reporting, and two
  * classic operators Spark has no built-in for.
  *
  *  - `stats_lift_table`: decile lift of a score against an outcome —
  *    the standard screen before trusting any scoring gate. Deciles by
  *    broadcast percentile cutoffs (no global ntile sort).
  *  - `ts_missingness_report`: per-series calendar completeness —
  *    expected/observed/missing day counts plus the LONGEST missing
  *    run (gap islands over the densified calendar).
  *  - `win_nearest_price`: 1-D nearest-neighbor matching by sorted
  *    adjacency — lead/lag over the sort order finds each row's
  *    closest peer with no join at all.
  *  - `agg_skyline_2d`: the 2-D skyline (Pareto frontier) via the
  *    sort + running-min trick — dominance checks without a self-join.
  */
object Wave21Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "stats_lift_table",
      // decile lift: score each document by length-noise quality
      // (chars per token — deterministic), split into deciles by
      // interpolated-percentile cutoffs (one 1-row broadcast, no
      // global sort), and report each decile's duplicate rate against
      // the corpus rate. The outcome is content-duplication (same
      // sorted token set appears elsewhere). Lift >> 1 in low deciles
      // = the score finds the junk.
      (s, dir) => {
        val d = T(s, dir, "documents")
          .select(col("doc_id"),
            (length(col("text")).cast("double") /
              (size(split(col("text"), " ")) + 1)).as("score"),
            md5(concat_ws(" ",
              array_sort(array_distinct(split(col("text"), " ")))))
              .as("fp"))
        val dup = d.groupBy("fp").agg(count(lit(1)).as("k"))
        val scored = d.join(dup, Seq("fp"))
          .select(col("doc_id"), col("score"),
            (col("k") > 1).cast("long").as("is_dup"))
        val cuts = broadcast(scored.agg(expr(
          "percentile(score, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
          .as("c")))
        // cutoff compares on the 1e-6 integer grid: the two engines'
        // linear interpolation differs by 1 ulp at some percentiles
        // (observed at sf0.1, p=0.8: 5 tied scores flipped deciles) —
        // grid-quantizing BOTH sides makes the boundary rule identical
        val g = (c: org.apache.spark.sql.Column) =>
          round(c * 1e6).cast("long")
        val dec = scored.crossJoin(cuts)
          .withColumn("decile",
            (lit(1) + (0 until 9).map(i =>
              (g(col("score")) > g(col("c")(i))).cast("int"))
              .reduce(_ + _))
              .cast("long"))
        val overall = dec.agg(
          (sum("is_dup") * lit(1000000) / count(lit(1))).as("baseppm"))
        dec.groupBy("decile")
          .agg(count(lit(1)).as("n"), sum("is_dup").as("dups"))
          .crossJoin(broadcast(overall))
          .select(col("decile"), col("n"), col("dups"),
            dround(col("dups").cast("double") * 1000000 / col("n") /
              col("baseppm"), 4).as("lift"))
          .orderBy("decile")
      },
      Some(
        "WITH d AS (SELECT doc_id, " +
          "CAST(length(text) AS DOUBLE) / " +
          "(len(string_split(text, ' ')) + 1) AS score, " +
          "md5(array_to_string(list_sort(list_distinct(" +
          "string_split(text, ' '))), ' ')) AS fp FROM documents), " +
          "dup AS (SELECT fp, count(*) AS k FROM d GROUP BY 1), " +
          "sc AS (SELECT doc_id, score, " +
          "CASE WHEN k > 1 THEN 1 ELSE 0 END AS is_dup " +
          "FROM d JOIN dup USING (fp)), " +
          "c AS (SELECT quantile_cont(score, " +
          "[0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q FROM sc), " +
          "sg AS (SELECT doc_id, is_dup, " +
          "CAST(round(score * 1e6) AS BIGINT) AS sg FROM sc), " +
          "cg AS (SELECT [CAST(round(q[1] * 1e6) AS BIGINT), " +
          "CAST(round(q[2] * 1e6) AS BIGINT), " +
          "CAST(round(q[3] * 1e6) AS BIGINT), " +
          "CAST(round(q[4] * 1e6) AS BIGINT), " +
          "CAST(round(q[5] * 1e6) AS BIGINT), " +
          "CAST(round(q[6] * 1e6) AS BIGINT), " +
          "CAST(round(q[7] * 1e6) AS BIGINT), " +
          "CAST(round(q[8] * 1e6) AS BIGINT), " +
          "CAST(round(q[9] * 1e6) AS BIGINT)] AS q FROM c), " +
          "dec AS (SELECT doc_id, is_dup, CAST(1 + " +
          "(sg > q[1])::INT + (sg > q[2])::INT + " +
          "(sg > q[3])::INT + (sg > q[4])::INT + " +
          "(sg > q[5])::INT + (sg > q[6])::INT + " +
          "(sg > q[7])::INT + (sg > q[8])::INT + " +
          "(sg > q[9])::INT AS BIGINT) AS decile FROM sg, cg), " +
          "o AS (SELECT sum(is_dup) * 1000000.0 / count(*) " +
          "AS baseppm FROM dec) " +
          "SELECT decile, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(is_dup) AS BIGINT) AS dups, " +
          droundSql("CAST(sum(is_dup) AS DOUBLE) * 1000000 / count(*) " +
            "/ baseppm", 4) + " AS lift " +
          "FROM dec, o GROUP BY decile, baseppm ORDER BY decile")
    ),
    Q(
      "ts_missingness_report",
      // calendar completeness per series (a sampled cohort, so real
      // gaps exist): expected days from first to last observation,
      // observed days, and the LONGEST consecutive missing run — gap
      // islands over the sequence-densified calendar, all keyed by
      // series. The data-quality report every ingest pipeline posts.
      (s, dir) => {
        val daily = T(s, dir, "events")
          .filter(col("user_id") % 97 === 0)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val cal = daily.groupBy("event_type")
          .agg(min("day").as("lo"), max("day").as("hi"))
          .select(col("event_type"),
            explode(sequence(col("lo"), col("hi"))).as("day"))
        val j = cal.join(daily, Seq("event_type", "day"), "left")
          .withColumn("missing", col("n").isNull.cast("long"))
        // islands over the MISSING rows only: within a missing run the
        // row_number steps with the day; an observed stretch makes the
        // day jump ahead of it → new group. (Numbering the dense
        // calendar instead would collapse all gaps into one group.)
        val w = Window.partitionBy("event_type").orderBy("day")
        val runs = j
          .filter(col("missing") === 1)
          .withColumn("grp", date_sub(col("day"),
            row_number().over(w)))
          .groupBy(col("event_type"), col("grp"))
          .agg(count(lit(1)).as("runlen"))
          .groupBy("event_type")
          .agg(max("runlen").as("longest_gap"))
        j.groupBy("event_type")
          .agg(count(lit(1)).as("expected_days"),
            sum(lit(1) - col("missing")).as("observed_days"),
            sum(col("missing")).as("missing_days"))
          .join(runs, Seq("event_type"), "left")
          .withColumn("longest_gap",
            coalesce(col("longest_gap"), lit(0L)))
          .orderBy("event_type")
      },
      Some(
        "WITH daily AS (SELECT event_type, " +
          "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
          "CAST(count(*) AS BIGINT) AS n FROM events " +
          "WHERE user_id % 97 = 0 GROUP BY 1, 2), " +
          "b AS (SELECT event_type, min(day) AS lo, max(day) AS hi " +
          "FROM daily GROUP BY 1), " +
          "cal AS (SELECT event_type, CAST(unnest(generate_series(" +
          "CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), " +
          "INTERVAL 1 DAY)) AS DATE) AS day FROM b), " +
          "j AS (SELECT c.event_type, c.day, " +
          "CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS missing " +
          "FROM cal c LEFT JOIN daily d " +
          "ON c.event_type = d.event_type AND c.day = d.day), " +
          "g AS (SELECT event_type, day, " +
          "day - CAST(row_number() OVER (PARTITION BY event_type " +
          "ORDER BY day) AS INTEGER) AS grp FROM j " +
          "WHERE missing = 1), " +
          "runs AS (SELECT event_type, max(runlen) AS longest_gap " +
          "FROM (SELECT event_type, grp, CAST(count(*) AS BIGINT) " +
          "AS runlen FROM g GROUP BY 1, 2) " +
          "GROUP BY 1) " +
          "SELECT j.event_type, " +
          "CAST(count(*) AS BIGINT) AS expected_days, " +
          "CAST(sum(1 - missing) AS BIGINT) AS observed_days, " +
          "CAST(sum(missing) AS BIGINT) AS missing_days, " +
          "coalesce(max(runs.longest_gap), 0) AS longest_gap " +
          "FROM j LEFT JOIN runs ON j.event_type = runs.event_type " +
          "GROUP BY j.event_type ORDER BY j.event_type")
    ),
    Q(
      "win_nearest_price",
      // 1-D nearest-neighbor matching WITHOUT a join: sort each status
      // group by price; each order's nearest-priced peer is one of its
      // two sorted neighbors (lead/lag), so the match is a window pass.
      // The idiom behind similar-record suggestion at any scale — an
      // n² nearest join collapses to a partition-bounded sort.
      (s, dir) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy("cents", "o_orderkey")
        val o = T(s, dir, "orders")
          .filter(col("o_orderkey") <= 20000)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        o.withColumn("prevc", lag("cents", 1).over(w))
          .withColumn("prevk", lag("o_orderkey", 1).over(w))
          .withColumn("nextc", lead("cents", 1).over(w))
          .withColumn("nextk", lead("o_orderkey", 1).over(w))
          .withColumn("nearest_key",
            when(col("prevc").isNull, col("nextk"))
              .when(col("nextc").isNull, col("prevk"))
              .when(col("cents") - col("prevc") <=
                col("nextc") - col("cents"), col("prevk"))
              .otherwise(col("nextk")))
          .withColumn("gap",
            when(col("prevc").isNull, col("nextc") - col("cents"))
              .when(col("nextc").isNull, col("cents") - col("prevc"))
              .otherwise(least(col("cents") - col("prevc"),
                col("nextc") - col("cents"))))
          .filter(col("nearest_key").isNotNull)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("cents") / 100.0).as("price"),
            col("nearest_key"), col("gap"))
          .orderBy("o_orderkey")
      },
      Some(
        "WITH o AS (SELECT o_orderkey, o_orderstatus, " +
          "CAST(round(o_totalprice * 100) AS BIGINT) AS cents " +
          "FROM orders WHERE o_orderkey <= 20000), " +
          "x AS (SELECT *, " +
          "lag(cents) OVER win AS prevc, " +
          "lag(o_orderkey) OVER win AS prevk, " +
          "lead(cents) OVER win AS nextc, " +
          "lead(o_orderkey) OVER win AS nextk " +
          "FROM o WINDOW win AS (PARTITION BY o_orderstatus " +
          "ORDER BY cents, o_orderkey)) " +
          "SELECT o_orderkey, o_orderstatus, cents / 100.0 AS price, " +
          "CASE WHEN prevc IS NULL THEN nextk " +
          "WHEN nextc IS NULL THEN prevk " +
          "WHEN cents - prevc <= nextc - cents THEN prevk " +
          "ELSE nextk END AS nearest_key, " +
          "CASE WHEN prevc IS NULL THEN nextc - cents " +
          "WHEN nextc IS NULL THEN cents - prevc " +
          "ELSE least(cents - prevc, nextc - cents) END AS gap " +
          "FROM x WHERE (CASE WHEN prevc IS NULL THEN nextk " +
          "WHEN nextc IS NULL THEN prevk " +
          "WHEN cents - prevc <= nextc - cents THEN prevk " +
          "ELSE nextk END) IS NOT NULL " +
          "ORDER BY o_orderkey")
    ),
    Q(
      "agg_skyline_2d",
      // the 2-D skyline (Pareto frontier): orders minimizing BOTH
      // price and date under (at-or-earlier, strictly-cheaper)
      // dominance with a (cents, key) tie order. Only each day's
      // cheapest row can survive, so the frontier reduces to one KEYED
      // aggregate (per-day representative) followed by a running-min
      // window over |days| rows — never a window or self-join over raw
      // orders. The classic skyline collapse for monotone dimensions.
      (s, dir) => {
        val o = T(s, dir, "orders")
          .select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("day"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val rep = o.groupBy("day")
          .agg(min(struct(col("cents"), col("o_orderkey"))).as("m"))
          .select(col("day"), col("m.cents").as("cents"),
            col("m.o_orderkey").as("o_orderkey"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1)
        rep.withColumn("minbefore", min("cents").over(w))
          .filter(col("minbefore").isNull ||
            col("cents") < col("minbefore"))
          .select(col("o_orderkey"), col("day"),
            (col("cents") / 100.0).as("price"))
          .orderBy("day", "o_orderkey")
      },
      Some(
        "WITH o AS (SELECT o_orderkey, " +
          "CAST(o_orderdate AS DATE) AS day, " +
          "CAST(round(o_totalprice * 100) AS BIGINT) AS cents " +
          "FROM orders), " +
          "d1 AS (SELECT day, min(cents) AS c FROM o GROUP BY 1), " +
          "rep AS (SELECT o.day, o.cents, min(o.o_orderkey) " +
          "AS o_orderkey FROM o JOIN d1 ON o.day = d1.day " +
          "AND o.cents = d1.c GROUP BY 1, 2), " +
          "x AS (SELECT *, min(cents) OVER (ORDER BY day " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
          "AS minbefore FROM rep) " +
          "SELECT o_orderkey, day, cents / 100.0 AS price FROM x " +
          "WHERE minbefore IS NULL OR cents < minbefore " +
          "ORDER BY day, o_orderkey")
    )
  )
}
