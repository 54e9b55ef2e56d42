package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Round-7 wave 24: iterative graph traversal, sequential-recurrence
  * forecasting, and runtime-filter join plumbing.
  *
  *  - `graph_shortest_path` is multi-round BFS relaxation over the same
  *    user↔event_type bipartite graph as `graph_pagerank`: distances
  *    from a seed node propagate through bounded `join → min` rounds
  *    (4 rounds ≥ the graph diameter; each round is one equi-join on
  *    the persisted edge list plus one min-aggregation — the edge
  *    shuffle happens once, rounds reuse it map-side). Distances are
  *    small integers so the DuckDB recursive-CTE oracle matches
  *    exactly. At 100 TB the relaxation joins the FRONTIER (nodes whose
  *    distance changed last round) instead of the full distance table —
  *    same plan shape, smaller probe side per round.
  *  - `ts_holt_linear` is Holt's linear-trend double exponential
  *    smoothing — a sequential recurrence over each series, SQL-hostile
  *    in window form. The scale shape: series are INDEPENDENT, so the
  *    fold runs per-series inside `mapGroups` (one shuffle on the
  *    series key, then a linear in-memory pass) and parallelism = the
  *    number of series — at 100 TB that's millions of SKU/region
  *    series, each bounded by its own history length. Determinism:
  *    α=β=0.5 with every step rounded half-up onto the integer cent
  *    grid, so both engines iterate identical BIGINTs (the oracle is
  *    the same recurrence as a recursive CTE over the month-spine
  *    series — gap months fill 0 on both sides).
  *  - `sql_order_by_all` rounds out the GROUP BY ALL surface: ORDER BY
  *    ALL orders by every select-list item left-to-right — identical
  *    semantics in Spark 4 and DuckDB.
  *  - `join_runtime_bloom` exercises Spark's RUNTIME bloom-filter join
  *    (`spark.sql.optimizer.runtime.bloomFilter.*`): a selective dim
  *    filter is turned into a bloom filter evaluated INSIDE the fact
  *    scan before the shuffle, cutting exchange volume by the filter's
  *    selectivity — the engine-native form of the manual bloom prune
  *    `agg_bloom_prune` builds by hand. Wave24Spec pins the
  *    `might_contain` expression in the optimized plan; the oracle is
  *    the plain join (the filter is semantics-free). Thresholds are
  *    scoped to the query and restored — the application-side size gate
  *    defaults to 10 GB, sized for real clusters, so the bench fixture
  *    must lower it to see the rewrite at all.
  */
object Wave24Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "graph_shortest_path",
      (s, dir) => {
        // unweighted projection of GraphBase's materialized bipartite
        // edge list (already distinct by construction — it's grouped on
        // (src, dst)); the events aggregation is paid once per family
        val ut = GraphBase.eventEdges(s, dir).select("src", "dst")
        val edges = ut.unionByName(
          ut.select(col("dst").as("src"), col("src").as("dst"))).persist()
        var dists = s.createDataFrame(Seq(("t:click", 0L)))
          .toDF("node", "dist")
        for (i <- 1 to 4) {
          val prev = dists
          val next = prev.join(edges, col("node") === col("src"))
            .select(col("dst").as("node"), lit(i.toLong).as("dist"))
          dists = prev.unionByName(next)
            .groupBy("node").agg(min("dist").as("dist"))
            .persist()
          dists.count() // materialize, then drop the previous round's cache
          if (i > 1) prev.unpersist()
        }
        val out = dists
          .groupBy("dist")
          .agg(
            count(lit(1)).as("n_nodes"),
            sum(when(col("node").startsWith("t:"), 1L).otherwise(0L))
              .as("n_type_nodes"))
        // snapshot the |dists|-row result eagerly so BOTH caches can be
        // released before returning — the caller's plan reads the
        // checkpoint, not a leaked InMemoryRelation
        val snap = out.localCheckpoint(true)
        dists.unpersist()
        edges.unpersist()
        snap.orderBy("dist")
      },
      Some(
        "WITH RECURSIVE edges AS (" +
          "SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src, " +
          "'t:' || event_type AS dst FROM events " +
          "UNION ALL " +
          "SELECT DISTINCT 't:' || event_type, " +
          "'u:' || CAST(user_id AS VARCHAR) FROM events), " +
          "walk(node, dist) AS (" +
          "SELECT 't:click', CAST(0 AS BIGINT) " +
          "UNION " +
          "SELECT e.dst, w.dist + 1 FROM walk w " +
          "JOIN edges e ON e.src = w.node WHERE w.dist < 4), " +
          "d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node) " +
          "SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes, " +
          "CAST(sum(CASE WHEN node LIKE 't:%' THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_type_nodes FROM d GROUP BY dist ORDER BY dist")
    ),
    Q(
      "ts_holt_linear",
      (s, dir) => {
        import s.implicits._
        val months = T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(T(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(T(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name").as("region"),
            trunc(col("o_orderdate"), "MM").as("m"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
        // bounds inlined once as literals (the recursive-CTE house rule:
        // a scalar subquery re-evaluates per iteration on the oracle side)
        val b = months.agg(min("m"), max("m")).first()
        val (lo, hi) = (b.getDate(0), b.getDate(1))
        val series = months.select("region").distinct()
          .withColumn("m", explode(expr(
            s"sequence(to_date('$lo'), to_date('$hi'), interval 1 month)")))
          .join(months, Seq("region", "m"), "left")
          .na.fill(0L, Seq("y"))
        series.select(col("region"), col("m"), col("y"))
          .as[(String, java.sql.Date, Long)]
          .groupByKey(_._1)
          .mapGroups { (r, it) =>
            val ys = it.toSeq.sortBy(_._2.getTime).map(_._3)
            var l = ys.head
            var tr = 0L
            ys.tail.foreach { y =>
              // α=β=0.5, each step rounded half-up to the cent grid —
              // pure integer state, identical in the recursive-CTE oracle
              val l2 = math.floor((y + l + tr) / 2.0 + 0.5).toLong
              tr = math.floor((l2 - l + tr) / 2.0 + 0.5).toLong
              l = l2
            }
            (r, l, tr, l + 3 * tr)
          }
          .toDF("region", "level_c", "trend_c", "forecast3_c")
          .orderBy("region")
      },
      Some {
        // same month spine, same integer recurrence, as a recursive CTE;
        // lo/hi literals are re-derived in SQL (cheap: one agg over the
        // pre-aggregated month table, not per-iteration)
        "WITH RECURSIVE months AS (" +
          "SELECT r.r_name AS region, date_trunc('month', o.o_orderdate) AS m, " +
          "CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y " +
          "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
          "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
          "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY 1, 2), " +
          "bounds AS (SELECT min(m) AS lo, max(m) AS hi FROM months), " +
          "spine AS (SELECT region, m, t FROM " +
          "(SELECT DISTINCT region FROM months), " +
          "(SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m, " +
          "unnest(generate_series(1, 1 + datediff('month', lo, hi))) AS t " +
          "FROM bounds)), " +
          "series AS (SELECT s.region, s.t, COALESCE(mo.y, 0) AS y " +
          "FROM spine s LEFT JOIN months mo " +
          "ON mo.region = s.region AND mo.m = s.m), " +
          "n AS (SELECT max(t) AS nt FROM series), " +
          "hw(region, t, l, b) AS (" +
          "SELECT region, 1, y, CAST(0 AS BIGINT) FROM series WHERE t = 1 " +
          "UNION ALL " +
          "SELECT s.region, s.t, " +
          "CAST(floor((s.y + h.l + h.b) / 2.0 + 0.5) AS BIGINT), " +
          "CAST(floor((CAST(floor((s.y + h.l + h.b) / 2.0 + 0.5) AS BIGINT) " +
          "- h.l + h.b) / 2.0 + 0.5) AS BIGINT) " +
          "FROM hw h JOIN series s ON s.region = h.region AND s.t = h.t + 1) " +
          "SELECT region, CAST(l AS BIGINT) AS level_c, " +
          "CAST(b AS BIGINT) AS trend_c, " +
          "CAST(l + 3 * b AS BIGINT) AS forecast3_c " +
          "FROM hw, n WHERE t = nt ORDER BY region"
      }
    ),
    Q(
      "sql_order_by_all",
      (s, dir) => {
        val v = s"ord_oba_${System.nanoTime()}"
        T(s, dir, "orders").createOrReplaceTempView(v)
        s.sql(
          s"SELECT o_orderstatus, o_orderpriority, " +
            s"CAST(count(*) AS BIGINT) AS n FROM $v " +
            "GROUP BY ALL ORDER BY ALL")
      },
      Some(
        "SELECT o_orderstatus, o_orderpriority, " +
          "CAST(count(*) AS BIGINT) AS n FROM orders " +
          "GROUP BY ALL ORDER BY ALL")
    ),
    Q(
      "join_runtime_bloom",
      (s, dir) => {
        val keys = Seq(
          "spark.sql.optimizer.runtime.bloomFilter.enabled",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
          "spark.sql.autoBroadcastJoinThreshold")
        val prev = keys.map(k => k -> s.conf.getOption(k)).toMap
        s.conf.set(keys(0), "true")
        s.conf.set(keys(1), "0") // fixture scan is far below the 10 GB default
        // plan-stat sizes are uncompressed guesses with no filter
        // selectivity applied — widen the creation gate so the fixture
        // dim qualifies at every sf
        s.conf.set(keys(2), "512MB")
        s.conf.set(keys(3), "-1") // force a shuffle join: bloom targets exchanges
        try {
          val o = T(s, dir, "orders")
            .filter(col("o_orderpriority") === "1-URGENT" &&
              col("o_orderdate") < lit("1997-01-01"))
            .select(col("o_orderkey"))
          val df = T(s, dir, "lineitem")
            .join(o, col("l_orderkey") === col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"),
              dsum(col("l_extendedprice"), 2).as("revenue"))
            .orderBy("l_returnflag")
          // executedPlan is cached on the QueryExecution: forcing it here
          // pins the bloom-injected plan past the conf restore below
          val plan = df.queryExecution.executedPlan.toString
          require(plan.contains("might_contain"),
            s"join_runtime_bloom: no runtime bloom filter injected:\n$plan")
          df
        } finally prev.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      },
      Some(
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("l_extendedprice", 2) + " AS revenue " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "WHERE o_orderpriority = '1-URGENT' AND o_orderdate < DATE '1997-01-01' " +
          "GROUP BY l_returnflag ORDER BY l_returnflag")
    )
  )
}
