package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 14: sequence analytics + SQL-surface idioms.
  *
  *  - `win_gaps_islands`: consecutive-day runs (the gaps-and-islands
  *    idiom) via the date-minus-row_number trick — one window pass per
  *    partition key, no self-join.
  *  - `sql_group_by_all` / `sql_distinct_on`: the two everyday SQL
  *    shorthands users reach for first (GROUP BY ALL; latest-row-per-key
  *    expressed as DISTINCT ON in the oracle, row_number=1 here).
  *  - `win_rolling_regr`: trailing 7-row regression slope per month —
  *    windowed `regr_slope`, partition-bounded sort.
  *  - `ts_locf_gapfill`: calendar densification + last-observation-
  *    carried-forward over a sparse daily series (`sequence`+`explode`
  *    for the calendar, `last(ignoreNulls)` for the fill).
  *  - `graph_triangle_count`: triangle count over the co-supplier graph
  *    in the oriented (u&lt;v) formulation — the standard trick that
  *    makes the enumeration join linear in wedge count, not edges³.
  */
object Wave14Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "win_gaps_islands",
      // islands of CONSECUTIVE ship days per supplier: date minus
      // row_number is constant within a run, so one partition-bounded
      // window pass + one hash aggregate finds every island — the
      // self-join-free gaps-and-islands idiom. Scale: both passes are
      // keyed by supplier; no global sort, no quadratic step.
      (s, dir) => {
        val d = T(s, dir, "lineitem")
          .select(col("l_suppkey"), to_date(col("l_shipdate")).as("d"))
          .distinct()
        val w = Window.partitionBy("l_suppkey").orderBy("d")
        d.withColumn("grp", date_sub(col("d"), row_number().over(w)))
          .groupBy(col("l_suppkey"), col("grp"))
          .agg(min("d").as("start_d"), max("d").as("end_d"),
            count(lit(1)).as("days"))
          .filter(col("days") >= 3)
          .select("l_suppkey", "start_d", "end_d", "days")
          .orderBy("l_suppkey", "start_d")
      },
      Some(
        "WITH d AS (SELECT DISTINCT l_suppkey, " +
          "CAST(l_shipdate AS DATE) AS d FROM lineitem), " +
          "g AS (SELECT l_suppkey, d, d - CAST(row_number() OVER " +
          "(PARTITION BY l_suppkey ORDER BY d) AS INTEGER) AS grp " +
          "FROM d) " +
          "SELECT l_suppkey, min(d) AS start_d, max(d) AS end_d, " +
          "CAST(count(*) AS BIGINT) AS days FROM g " +
          "GROUP BY l_suppkey, grp HAVING count(*) >= 3 " +
          "ORDER BY l_suppkey, start_d")
    ),
    Q(
      "sql_group_by_all",
      // GROUP BY ALL: every non-aggregate select item becomes a group
      // key — same plan as the explicit form (hash aggregate with
      // map-side partials), purely an analysis-time convenience.
      (s, dir) => {
        T(s, dir, "lineitem").createOrReplaceTempView("w14_li")
        s.sql(
          "SELECT l_returnflag, l_linestatus, " +
            "CAST(count(*) AS BIGINT) AS n, " +
            s"${dsumSql("l_quantity", 2)} AS sum_qty " +
            "FROM w14_li GROUP BY ALL " +
            "ORDER BY l_returnflag, l_linestatus")
      },
      Some(
        "SELECT l_returnflag, l_linestatus, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          s"${dsumSql("l_quantity", 2)} AS sum_qty " +
          "FROM lineitem GROUP BY ALL " +
          "ORDER BY l_returnflag, l_linestatus")
    ),
    Q(
      "sql_distinct_on",
      // latest order per customer — DISTINCT ON in the oracle,
      // row_number()=1 here (Spark's idiom for the same thing). The
      // window sort is bounded per customer; ties break on orderkey so
      // both engines pick the identical row.
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        T(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("last_day"),
            dround(col("o_totalprice"), 2).as("price"))
          .orderBy("o_custkey")
      },
      Some(
        "SELECT * FROM (SELECT DISTINCT ON (o_custkey) o_custkey, " +
          "o_orderkey, CAST(o_orderdate AS DATE) AS last_day, " +
          s"${droundSql("o_totalprice", 2)} AS price FROM orders " +
          "ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC) " +
          "ORDER BY o_custkey")
    ),
    Q(
      "win_rolling_regr",
      // trailing-7-day revenue trend per month: the regression slope
      // computed CLOSED-FORM from windowed INTEGER sums
      // ((nΣxy − ΣxΣy)/(nΣx² − (Σx)²)) — every window sum is exact
      // int64 on both engines (native regr_slope's streaming covariance
      // cancels catastrophically here and flips rounded values), so the
      // one double division sees identical inputs. Scale: the window
      // sort is bounded by a month's day count per partition.
      (s, dir) => {
        val daily = T(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("cents"))
          .withColumn("mo", date_trunc("month", col("day")).cast("date"))
          .withColumn("xi",
            datediff(col("day"), to_date(lit("1992-01-01")))
              .cast("long"))
        val w = Window.partitionBy("mo").orderBy("day")
          .rowsBetween(-6, 0)
        val n = count(lit(1)).over(w)
        val sx = sum(col("xi")).over(w)
        val sy = sum(col("cents")).over(w)
        val sxy = sum(col("xi") * col("cents")).over(w)
        val sxx = sum(col("xi") * col("xi")).over(w)
        val den = n * sxx - sx * sx
        daily
          .withColumn("slope",
            when(den === 0, lit(null))
              .otherwise(round((n * sxy - sx * sy).cast("double") /
                den.cast("double")).cast("long")))
          .select(col("day"), (col("cents") / 100).as("revenue"),
            col("slope"))
          .orderBy("day")
      },
      Some(
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, " +
          "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents " +
          "FROM orders GROUP BY 1), " +
          "w AS (SELECT day, cents, " +
          "count(*) OVER win AS n, " +
          "sum(day - DATE '1992-01-01') OVER win AS sx, " +
          "sum(cents) OVER win AS sy, " +
          "sum((day - DATE '1992-01-01') * cents) OVER win AS sxy, " +
          "sum((day - DATE '1992-01-01') * (day - DATE '1992-01-01')) " +
          "OVER win AS sxx FROM daily WINDOW win AS " +
          "(PARTITION BY date_trunc('month', day) ORDER BY day " +
          "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) " +
          "SELECT day, cents / 100 AS revenue, " +
          "CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE " +
          "CAST(round(CAST(n * sxy - sx * sy AS DOUBLE) / " +
          "CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) END AS slope " +
          "FROM w ORDER BY day")
    ),
    Q(
      "ts_locf_gapfill",
      // calendar densification + last-observation-carried-forward over
      // a SPARSE daily series (a sampled user cohort, so real gaps
      // exist): per-series `sequence` builds the calendar (no driver
      // loop, no cross join), a left join lands the observations, and
      // `last(ignoreNulls)` forward-fills — every step keyed by series.
      (s, dir) => {
        val daily = T(s, dir, "events")
          .filter(col("user_id") % 97 === 0)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val cal = daily.groupBy("event_type")
          .agg(min("day").as("lo"), max("day").as("hi"))
          .select(col("event_type"),
            explode(sequence(col("lo"), col("hi"))).as("day"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cal.join(daily, Seq("event_type", "day"), "left")
          .withColumn("filled", last(col("n"), ignoreNulls = true).over(w))
          .select(col("event_type"), col("day"), col("filled"))
          .orderBy("event_type", "day")
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
          "j AS (SELECT c.event_type, c.day, d.n FROM cal c " +
          "LEFT JOIN daily d ON c.event_type = d.event_type " +
          "AND c.day = d.day) " +
          "SELECT event_type, day, last_value(n IGNORE NULLS) OVER " +
          "(PARTITION BY event_type ORDER BY day ROWS BETWEEN " +
          "UNBOUNDED PRECEDING AND CURRENT ROW) AS filled " +
          "FROM j ORDER BY event_type, day")
    ),
    Q(
      "graph_triangle_count",
      // triangle count over the co-supplier graph (suppliers sharing an
      // order are adjacent), in the ORIENTED formulation: every edge is
      // stored once as u<v, so each triangle is enumerated exactly once
      // and the join explores wedges, not all edge triples. The edge base
      // is GraphBase's build-once materialization (the basket join was
      // this op's ~3 s floor when rebuilt per query); the wedge join then
      // probes a column-pruned two-int64 scan. At cluster scale the same
      // plan shuffles on vertex ids over the maintained edge table.
      (s, dir) => {
        val e = GraphBase.coSupplierEdges(s, dir)
        val edges = e.agg(count(lit(1)).as("edges"))
        // the wedge stage fans 137k edges out to ~13M wedges (sf0.1) —
        // broadcasting the probe sides (two-int64 table, ~2 MB) turns
        // both joins into in-codegen hash probes with ZERO shuffles of
        // the wedge stream. At real-graph scale, where the edge table
        // outgrows a broadcast, the plan flips to shuffle-on-vertex-id
        // with degree-ordered orientation; the size gate is the same
        // broadcast-threshold decision AQE makes
        val eb = broadcast(e)
        // the edge scan is ~2 MB → one input split, and AQE would
        // re-coalesce a bare repartition(col) right back to 1 task; the
        // EXPLICIT count pins the spread so the 13M-wedge fan-out runs
        // on every core (a 2 MB shuffle to buy full parallelism on the
        // expensive stage)
        val nSlices = s.sparkContext.defaultParallelism
        val tri = e.repartition(nSlices, col("u")).as("e1")
          .join(eb.as("e2"), col("e1.v") === col("e2.u"))
          .join(eb.as("e3"),
            col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
          .agg(count(lit(1)).as("triangles"))
        edges.crossJoin(tri) // two 1-row frames
      },
      Some(
        GraphBase.coSupplierEdgesSql.stripSuffix(", ") + " " +
          "SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS edges, " +
          "(SELECT CAST(count(*) AS BIGINT) FROM e e1 " +
          "JOIN e e2 ON e1.v = e2.u " +
          "JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v) AS triangles")
    )
  )
}
