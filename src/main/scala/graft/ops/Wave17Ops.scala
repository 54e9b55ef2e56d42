package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 17: operational analytics.
  *
  *  - `ts_seasonal_anomaly`: each (day, hour) traffic bucket scored in
  *    stddev units against ITS OWN hour-of-day baseline — the seasonal
  *    z-score that a flat global threshold gets wrong twice a day.
  *  - `agg_customer_growth`: cumulative distinct customers by
  *    first-order month (the growth curve) — first-touch reduction,
  *    then a window over the tiny monthly aggregate.
  *  - `agg_basket_lift`: brand co-occurrence lift within orders — the
  *    market-basket association measure, bounded per order by the
  *    basket size (never an unblocked self-join).
  *  - `set_union_by_name`: position-independent union (`unionByName` /
  *    DuckDB's UNION ALL BY NAME) — the schema-drift-tolerant form.
  */
object Wave17Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "ts_seasonal_anomaly",
      // seasonal z-score: (bucket − its-hour mean) / its-hour stddev,
      // from exact integer sums (nΣx², (Σx)² closed form) so both
      // engines divide identical numbers. Two keyed aggregates + a
      // 24-row broadcast join; flagged |z| ≥ 2. At 100 TB the baseline
      // is a per-hour partial aggregate — no window, no global sort.
      (s, dir) => {
        val buckets = T(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"),
            hour(col("ts")).cast("long").as("hod"))
          .agg(count(lit(1)).as("n"))
        val stats = buckets.groupBy("hod")
          .agg(count(lit(1)).as("k"), sum(col("n")).as("s1"),
            sum(col("n") * col("n")).as("s2"))
          .filter(col("k") >= 2)
        buckets.join(broadcast(stats), Seq("hod"))
          .withColumn("z",
            (col("n") * col("k") - col("s1")).cast("double") /
              (sqrt((col("k") * col("s2") - col("s1") * col("s1"))
                .cast("double")) * sqrt(col("k").cast("double"))))
          .select(col("day"), col("hod"), col("n"),
            dround(col("z"), 4).as("z"),
            (abs(col("z")) >= 2.0).as("anomaly"))
          .orderBy("day", "hod")
      },
      Some(
        "WITH b AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
          "CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod, " +
          "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), " +
          "st AS (SELECT hod, CAST(count(*) AS BIGINT) AS k, " +
          "CAST(sum(n) AS BIGINT) AS s1, " +
          "CAST(sum(n * n) AS BIGINT) AS s2 FROM b GROUP BY 1 " +
          "HAVING count(*) >= 2), " +
          "z AS (SELECT b.day, b.hod, b.n, " +
          "CAST(b.n * st.k - st.s1 AS DOUBLE) / " +
          "(sqrt(CAST(st.k * st.s2 - st.s1 * st.s1 AS DOUBLE)) * " +
          "sqrt(CAST(st.k AS DOUBLE))) AS z " +
          "FROM b JOIN st ON b.hod = st.hod) " +
          "SELECT day, hod, n, " + droundSql("z", 4) + " AS z, " +
          "(abs(z) >= 2.0) AS anomaly FROM z ORDER BY day, hod")
    ),
    Q(
      "agg_customer_growth",
      // cumulative distinct customers by first-order MONTH (the growth
      // curve): reduce each customer to their first order (one keyed
      // aggregate), count acquisitions per month, then a running sum
      // over the month-level aggregate — the window touches |months|
      // rows, not |orders|, which is what makes the growth curve cheap
      // at any scale.
      (s, dir) => {
        val firstMo = T(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(min(date_trunc("month", col("o_orderdate")).cast("date"))
            .as("mo"))
        val monthly = firstMo.groupBy("mo")
          .agg(count(lit(1)).as("new_customers"))
        val w = Window.orderBy("mo")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        monthly
          .withColumn("total_customers",
            sum(col("new_customers")).over(w))
          .orderBy("mo")
      },
      Some(
        "WITH f AS (SELECT o_custkey, " +
          "CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS mo " +
          "FROM orders GROUP BY o_custkey), " +
          "d AS (SELECT mo, CAST(count(*) AS BIGINT) AS new_customers " +
          "FROM f GROUP BY mo) " +
          "SELECT mo, new_customers, " +
          "CAST(sum(new_customers) OVER (ORDER BY mo ROWS BETWEEN " +
          "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
          "AS total_customers FROM d ORDER BY mo")
    ),
    Q(
      "agg_basket_lift",
      // market-basket association: brand pairs co-occurring in an
      // order, scored by LIFT = P(ab)/(P(a)·P(b)). The pair generation
      // is bounded per order by the basket's distinct-brand count (a
      // within-group combination, never an unblocked self-join); counts
      // stay exact integers and the lift divides them once. Pairs are
      // oriented (brand_a < brand_b) so each association appears once.
      // ONE shuffle on ok builds the per-order brand set (collect_set
      // dedups with map-side partials); pairs explode from the sorted
      // set inside codegen — vs the previous distinct + two-sided
      // self-join shape this removes two full shuffles of the basket
      // frame (measured ~2x on the dominant stages at sf0.1).
      (s, dir) => {
        val sets = T(s, dir, "lineitem")
          .join(broadcast(T(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_orderkey").as("ok"))
          .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
        // no persist: the three consumers below share an IDENTICAL
        // aggregation subtree, so Spark reuses one shuffle exchange
        // (ReusedExchange) within the single action — caching would only
        // leak session cache
        val nOrders = sets.agg(count(lit(1)).as("n_orders"))
        val single = sets.select(explode(col("bs")).as("b"))
          .groupBy("b").agg(count(lit(1)).as("n"))
        val pairs = sets.select(explode(expr(
            "flatten(transform(bs, (x, i) -> " +
              "transform(slice(bs, i + 2, size(bs) - i - 1), " +
              "y -> named_struct('a', x, 'b', y))))")).as("p"))
          .groupBy(col("p.a").as("brand_a"), col("p.b").as("brand_b"))
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 20)
        pairs
          .join(broadcast(single.withColumnRenamed("b", "brand_a")
            .withColumnRenamed("n", "n_a")), Seq("brand_a"))
          .join(broadcast(single.withColumnRenamed("b", "brand_b")
            .withColumnRenamed("n", "n_b")), Seq("brand_b"))
          .crossJoin(broadcast(nOrders))
          .select(col("brand_a"), col("brand_b"), col("n_ab"),
            dround(col("n_ab").cast("double") * col("n_orders") /
              (col("n_a") * col("n_b")), 4).as("lift"))
          .orderBy("brand_a", "brand_b")
      },
      Some(
        "WITH baskets AS (SELECT DISTINCT l_orderkey AS ok, p_brand " +
          "AS b FROM lineitem JOIN part ON l_partkey = p_partkey), " +
          "no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) " +
          "AS n_orders FROM baskets), " +
          "s AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM baskets " +
          "GROUP BY b), " +
          "p AS (SELECT x.b AS brand_a, y.b AS brand_b, " +
          "CAST(count(*) AS BIGINT) AS n_ab FROM baskets x " +
          "JOIN baskets y ON x.ok = y.ok AND x.b < y.b " +
          "GROUP BY 1, 2 HAVING count(*) >= 20) " +
          "SELECT p.brand_a, p.brand_b, p.n_ab, " +
          droundSql("CAST(p.n_ab AS DOUBLE) * no.n_orders / " +
            "(sa.n * sb.n)", 4) + " AS lift " +
          "FROM p JOIN s sa ON p.brand_a = sa.b " +
          "JOIN s sb ON p.brand_b = sb.b, no " +
          "ORDER BY p.brand_a, p.brand_b")
    ),
    Q(
      "set_union_by_name",
      // position-independent union: columns align by NAME, not
      // position (`Dataset.unionByName`; Spark's SQL parser has no
      // BY NAME clause yet, DuckDB's does — both resolve to the same
      // column-reordered union plan). The union that survives schema
      // drift between extracts.
      (s, dir) => {
        val c = T(s, dir, "customer")
        val a = c.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("k"),
            col("c_mktsegment").as("seg"), lit("a").as("src"))
        val b = c.filter(col("c_custkey") % 3 === 1)
          .select(lit("b").as("src"),
            col("c_mktsegment").as("seg"), col("c_custkey").as("k"))
        a.unionByName(b).orderBy("k", "src")
      },
      Some(
        "SELECT c_custkey AS k, c_mktsegment AS seg, 'a' AS src " +
          "FROM customer WHERE c_custkey % 3 = 0 " +
          "UNION ALL BY NAME " +
          "SELECT 'b' AS src, c_mktsegment AS seg, c_custkey AS k " +
          "FROM customer WHERE c_custkey % 3 = 1 " +
          "ORDER BY k, src")
    )
  )
}
