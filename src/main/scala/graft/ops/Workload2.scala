package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** The rest of the TPC-H-shaped workload (Q2/Q4/Q7/Q8/Q9/Q11/Q13/Q15/Q16/
  * Q17/Q19/Q20/Q21/Q22 analogs), adapted to the reduced fixture schema
  * (no partsupp/commitdate/receiptdate/phone — see TESTDATA.md). Each
  * keeps the *plan shape* that makes the original interesting:
  * correlated EXISTS, scalar subqueries, min-per-group self-reference,
  * NOT IN anti joins, disjunctive pushdown, multi-EXISTS.
  *
  * Scale notes: all dimension joins broadcast (part 200k rows at sf1 is
  * still < 10 MB projected); the fact-side joins shuffle once on the join
  * key; scalar-subquery thresholds are computed as exact scaled-integer
  * sums (associative — partial-agg order can't change them) and compared
  * in integer space, so AQE/partition layout can't flip a boundary row.
  */
object Workload2 extends QueryModule {

  private def rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private def revSql = "l_extendedprice*(1-l_discount)"

  def queries: Seq[Q] = Seq(
    Q(
      "q2_min_cost_supplier",
      // Q2 analog: cheapest EUROPE supplier per LARGE small-size part,
      // unit cost derived from lineitem (no partsupp in this schema).
      // min-per-group self-reference: agg, re-agg on the group key, join
      // back on equality with the min (exact: min is a selection, not an
      // accumulation — both engines pick the same double).
      (s, dir) => {
        val eu = T(s, dir, "supplier")
          .join(broadcast(T(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(T(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val pk = T(s, dir, "part")
          .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
          .select("p_partkey")
        val uc = T(s, dir, "lineitem")
          .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
          .join(eu, col("l_suppkey") === col("s_suppkey"))
          .groupBy("p_partkey", "s_suppkey", "s_name", "n_name", "s_acctbal")
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("uc"))
        val best = uc.groupBy(col("p_partkey").as("bp"))
          .agg(min(col("uc")).as("min_uc"))
        uc.join(best, col("p_partkey") === col("bp") &&
            col("uc") === col("min_uc"))
          .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
            col("n_name"), col("s_acctbal"),
            dround(col("uc"), 4).as("unit_cost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some(
        "WITH eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name " +
          "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), " +
          "ucs AS (SELECT p_partkey, s_suppkey, s_name, n_name, s_acctbal, " +
          "min(l_extendedprice/l_quantity) AS uc FROM lineitem " +
          "JOIN part ON l_partkey = p_partkey JOIN eu ON l_suppkey = s_suppkey " +
          "WHERE p_type = 'LARGE' AND p_size <= 10 GROUP BY 1,2,3,4,5) " +
          "SELECT p_partkey, s_suppkey, s_name, n_name, s_acctbal, " +
          droundSql("uc", 4) + " AS unit_cost FROM ucs u1 " +
          "WHERE uc = (SELECT min(u2.uc) FROM ucs u2 " +
          "WHERE u2.p_partkey = u1.p_partkey) " +
          "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100")
    ),
    Q(
      "q4_order_priority",
      // Q4 analog: orders in a window with >=1 "late" line (shipped >60
      // days after order date — no commitdate here), counted per priority.
      // The correlated EXISTS becomes a left-semi join whose condition
      // references both sides.
      (s, dir) =>
        T(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
          .join(T(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") >
                date_add(col("o_orderdate").cast("date"), 60)
                  .cast("timestamp"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).cast("long").as("order_count"))
          .orderBy("o_orderpriority"),
      Some(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count " +
          "FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' " +
          "AND o_orderdate < TIMESTAMP '1997-07-01' " +
          "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
          "AND l_shipdate > CAST(o_orderdate AS DATE) + 60) " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    ),
    Q(
      "q7_volume_shipping",
      // Q7 analog: bilateral trade volume between two nations by year.
      // The same dimension table joined twice under different roles —
      // exercises self-join aliasing and a disjunctive pair predicate.
      (s, dir) => {
        val n1 = T(s, dir, "nation")
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
        val n2 = T(s, dir, "nation")
          .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
        T(s, dir, "supplier")
          .join(T(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
          .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("snk"))
          .join(broadcast(n2), col("c_nationkey") === col("cnk"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("yr"))
          .agg(dsum(rev, 4).as("volume"))
          .orderBy("supp_nation", "cust_nation", "yr")
      },
      Some(
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
          "CAST(year(l_shipdate) AS BIGINT) AS yr, " +
          dsumSql(revSql, 4) + " AS volume " +
          "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
          "JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN customer ON o_custkey = c_custkey " +
          "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
          "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
          "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR " +
          "(n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) " +
          "AND l_shipdate >= TIMESTAMP '1996-01-01' " +
          "AND l_shipdate < TIMESTAMP '1998-01-01' " +
          "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3")
    ),
    Q(
      "q8_market_share",
      // Q8 analog: NATION_3's share of ECONOMY-part revenue sold to
      // EUROPE customers, per year. Share = conditional-sum / sum over
      // exact scaled-integer sums, so the ratio is identical cross-engine.
      (s, dir) => {
        val sup = T(s, dir, "supplier")
          .join(broadcast(T(s, dir, "nation")
            .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("snk"))
          .select("s_suppkey", "supp_nation")
        val custEu = T(s, dir, "customer")
          .join(broadcast(T(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(T(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .select("c_custkey")
        val revc = round(rev * 1e4).cast("long")
        T(s, dir, "lineitem")
          .join(broadcast(T(s, dir, "part")
            .filter(col("p_type") === "ECONOMY").select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(custEu, col("o_custkey") === col("c_custkey"), "left_semi")
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
          .agg(
            sum(when(col("supp_nation") === "NATION_3", revc).otherwise(0L))
              .as("nc"),
            sum(revc).as("tc"))
          .select(col("yr"),
            dround(col("nc").cast("double") / col("tc"), 6).as("mkt_share"))
          .orderBy("yr")
      },
      Some(
        "SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, " +
          droundSql("CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN " +
            s"CAST(round(($revSql)*1e4) AS BIGINT) ELSE 0 END) AS DOUBLE) / " +
            s"sum(CAST(round(($revSql)*1e4) AS BIGINT))", 6) +
          " AS mkt_share " +
          "FROM lineitem JOIN part ON l_partkey = p_partkey " +
          "JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN supplier ON l_suppkey = s_suppkey " +
          "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
          "WHERE p_type = 'ECONOMY' " +
          "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
          "AND o_orderdate < TIMESTAMP '1998-01-01' " +
          "AND EXISTS (SELECT 1 FROM customer " +
          "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
          "JOIN region ON n1.n_regionkey = r_regionkey " +
          "WHERE c_custkey = o_custkey AND r_name = 'EUROPE') " +
          "GROUP BY 1 ORDER BY 1")
    ),
    Q(
      "q9_product_profit",
      // Q9 analog: profit on widget parts per supplier nation per year;
      // cost proxied from part.p_retailprice (no ps_supplycost here).
      (s, dir) => {
        val profit = rev - lit(0.5) * col("p_retailprice") * col("l_quantity")
        T(s, dir, "lineitem")
          .join(broadcast(T(s, dir, "part")
            .filter(col("p_name").like("%widget%"))
            .select("p_partkey", "p_retailprice")),
            col("l_partkey") === col("p_partkey"))
          .join(T(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(T(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"),
            year(col("o_orderdate")).cast("long").as("yr"))
          .agg(dsum(profit, 4).as("profit"))
          .orderBy(col("n_name"), col("yr").desc)
      },
      Some(
        "SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr, " +
          dsumSql(s"$revSql - 0.5*p_retailprice*l_quantity", 4) +
          " AS profit " +
          "FROM lineitem JOIN part ON l_partkey = p_partkey " +
          "JOIN supplier ON l_suppkey = s_suppkey " +
          "JOIN nation ON s_nationkey = n_nationkey " +
          "JOIN orders ON l_orderkey = o_orderkey " +
          "WHERE p_name LIKE '%widget%' " +
          "GROUP BY 1, 2 ORDER BY n_name, yr DESC")
    ),
    Q(
      "q11_value_concentration",
      // Q11 analog: suppliers carrying > 1.02x the MEAN supplier value
      // (lineitem-derived; the relative threshold is scale-free, unlike
      // Q11's fixed fraction, which no supplier reaches once the supplier
      // count grows). Compared in exact integer space (50*vc*n > 51*total)
      // — no floating boundary to flip between engines.
      (s, dir) => {
        val supval = T(s, dir, "lineitem")
          .join(T(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_suppkey", "s_name")
          .agg(sum(round(rev * 100).cast("long")).as("vc"))
        val total = supval.agg(sum(col("vc")).as("total_vc"),
          count(lit(1)).as("n_sup"))
        supval.join(broadcast(total))
          .filter(col("vc") * col("n_sup") * 50 > col("total_vc") * 51)
          .select(col("s_suppkey"), col("s_name"),
            (col("vc") / 100.0).as("supplied_value"))
          .orderBy(col("vc").desc, col("s_suppkey"))
      },
      Some(
        "WITH supval AS (SELECT s_suppkey, s_name, " +
          s"sum(CAST(round(($revSql)*100) AS BIGINT)) AS vc " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "GROUP BY 1, 2) " +
          "SELECT s_suppkey, s_name, vc/100.0 AS supplied_value FROM supval " +
          "WHERE vc * (SELECT count(*) FROM supval) * 50 > " +
          "(SELECT sum(vc) FROM supval) * 51 " +
          "ORDER BY vc DESC, s_suppkey")
    ),
    Q(
      "q13_customer_distribution",
      // Q13: orders-per-customer histogram. The join-side-only predicate
      // must live in the LEFT JOIN condition (a WHERE would drop the
      // zero-order customers the query exists to count).
      (s, dir) =>
        T(s, dir, "customer")
          .join(T(s, dir, "orders")
            .filter(col("o_orderpriority") =!= "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).cast("long").as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).cast("long").as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc),
      Some(
        "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (" +
          "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count " +
          "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
          "AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) " +
          "GROUP BY c_count ORDER BY custdist DESC, c_count DESC")
    ),
    Q(
      "q15_top_supplier",
      // Q15: supplier(s) achieving the max quarterly revenue. The
      // scalar-max is joined back on exact scaled-integer equality.
      (s, dir) => {
        val srev = T(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy("l_suppkey")
          .agg(sum(round(rev * 1e4).cast("long")).as("rc"))
        val mx = srev.agg(max(col("rc")).as("max_rc"))
        T(s, dir, "supplier")
          .join(srev, col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(mx))
          .filter(col("rc") === col("max_rc"))
          .select(col("s_suppkey"), col("s_name"),
            (col("rc") / 1e4).as("total_rev"))
          .orderBy("s_suppkey")
      },
      Some(
        "WITH srev AS (SELECT l_suppkey, " +
          s"sum(CAST(round(($revSql)*1e4) AS BIGINT)) AS rc " +
          "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
          "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY 1) " +
          "SELECT s_suppkey, s_name, rc/1e4 AS total_rev " +
          "FROM supplier JOIN srev ON s_suppkey = l_suppkey " +
          "WHERE rc = (SELECT max(rc) FROM srev) ORDER BY s_suppkey")
    ),
    Q(
      "q16_supplier_counts",
      // Q16 analog: distinct supplier counts per part attribute bucket,
      // excluding blacklisted suppliers (NOT IN → left-anti join; the
      // subquery key is non-null so the semantics coincide).
      (s, dir) =>
        T(s, dir, "lineitem")
          .join(broadcast(T(s, dir, "part")
            .filter(col("p_brand") =!= "Brand#1" &&
              col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
            .select("p_partkey", "p_brand", "p_type", "p_size")),
            col("l_partkey") === col("p_partkey"))
          .join(T(s, dir, "supplier").filter(col("s_acctbal") < 0)
            .select("s_suppkey"),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).cast("long")
            .as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size")),
      Some(
        "SELECT p_brand, p_type, p_size, " +
          "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt " +
          "FROM lineitem JOIN part ON l_partkey = p_partkey " +
          "WHERE p_brand <> 'Brand#1' " +
          "AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29) " +
          "AND l_suppkey NOT IN " +
          "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
          "GROUP BY 1, 2, 3 " +
          "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size")
    ),
    Q(
      "q17_small_qty_revenue",
      // Q17: revenue from unusually-small-quantity lines of one brand,
      // threshold = 0.2 * per-part average quantity (correlated scalar
      // subquery → per-part agg + join). Quantities are integral doubles,
      // so the average is an exact sum / count — portable as long as both
      // engines evaluate the identical expression tree.
      (s, dir) => {
        val pk = T(s, dir, "part")
          .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
          .select("p_partkey")
        val li = T(s, dir, "lineitem")
          .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
        val avgq = li.groupBy(col("l_partkey").as("apk"))
          .agg((sum(col("l_quantity")).cast("double") /
            count(lit(1))).as("aq"))
        li.join(avgq, col("l_partkey") === col("apk"))
          .filter(col("l_quantity") < lit(0.2) * col("aq"))
          .agg(
            count(lit(1)).cast("long").as("n_lines"),
            dround(
              (sum(round(col("l_extendedprice") * 100).cast("long")) /
                lit(7.0)) / 100.0, 2).as("avg_yearly"))
          .select(col("n_lines"), col("avg_yearly"))
      },
      Some(
        "WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice " +
          "FROM lineitem JOIN part ON l_partkey = p_partkey " +
          "WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'), " +
          "avgq AS (SELECT l_partkey AS apk, " +
          "CAST(sum(l_quantity) AS DOUBLE)/count(*) AS aq " +
          "FROM li GROUP BY 1) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_lines, " +
          droundSql(
            "(sum(CAST(round(l_extendedprice*100) AS BIGINT))/7.0)/100.0",
            2) + " AS avg_yearly " +
          "FROM li JOIN avgq ON l_partkey = apk " +
          "WHERE l_quantity < 0.2 * aq")
    ),
    Q(
      "q19_disjunctive_pred",
      // Q19: OR-of-conjunctive-brackets over a fact⋈dim join. Catalyst
      // extracts the common l_partkey=p_partkey conjunct so the join is
      // still an equi hash join, with the disjunction as a post-filter.
      (s, dir) =>
        T(s, dir, "lineitem")
          .join(broadcast(T(s, dir, "part")),
            col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
              col("l_quantity").between(1, 11)) ||
              (col("p_brand") === "Brand#2" && col("p_size").between(10, 20) &&
                col("l_quantity").between(10, 20)) ||
              (col("p_brand") === "Brand#3" && col("p_size").between(20, 35) &&
                col("l_quantity").between(20, 30)))
          .agg(dsum(rev, 4).as("revenue"),
            count(lit(1)).cast("long").as("n_lines"))
          .select(col("revenue"), col("n_lines")),
      Some(
        "SELECT " + dsumSql(revSql, 4) + " AS revenue, " +
          "CAST(count(*) AS BIGINT) AS n_lines " +
          "FROM lineitem JOIN part ON l_partkey = p_partkey " +
          "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 " +
          "AND l_quantity BETWEEN 1 AND 11) " +
          "OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 20 " +
          "AND l_quantity BETWEEN 10 AND 20) " +
          "OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35 " +
          "AND l_quantity BETWEEN 20 AND 30)")
    ),
    Q(
      "q20_excess_supply",
      // Q20 analog: suppliers that moved > 300 units of red parts in
      // 1997 — chained IN subqueries become semi joins; the HAVING
      // threshold is exact (integral quantities, integer sum).
      (s, dir) => {
        val redParts = T(s, dir, "part")
          .filter(col("p_name").like("red%")).select("p_partkey")
        val heavy = T(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(redParts), col("l_partkey") === col("p_partkey"),
            "left_semi")
          .groupBy("l_suppkey")
          .agg(sum(col("l_quantity").cast("long")).as("qty"))
          .filter(col("qty") > 300)
        T(s, dir, "supplier")
          .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      Some(
        "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (" +
          "SELECT l_suppkey FROM lineitem " +
          "WHERE l_partkey IN (SELECT p_partkey FROM part " +
          "WHERE p_name LIKE 'red%') " +
          "AND l_shipdate >= TIMESTAMP '1997-01-01' " +
          "AND l_shipdate < TIMESTAMP '1998-01-01' " +
          "GROUP BY l_suppkey " +
          "HAVING sum(CAST(l_quantity AS BIGINT)) > 300) " +
          "ORDER BY s_suppkey")
    ),
    Q(
      "q21_waiting_supplier",
      // Q21 analog: suppliers in NATION_5 who were the ONLY late supplier
      // on a finished multi-supplier order. The EXISTS / NOT EXISTS pair
      // collapses to per-order aggregates: late line of supplier s counts
      // iff the order has >=2 distinct suppliers and exactly one distinct
      // LATE supplier (which must then be s).
      (s, dir) => {
        // per-order supplier counts come from collect_set over a window
        // partitioned by the SAME key the join just shuffled on — Catalyst
        // reuses the exchange, so the whole query is one lineitem⋈orders
        // shuffle instead of joining the fact against its own aggregate
        // (which would scan+shuffle it twice)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey")
        val lo = T(s, dir, "lineitem")
          .join(T(s, dir, "orders").filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("late",
            col("l_shipdate") >
              date_add(col("o_orderdate").cast("date"), 75).cast("timestamp"))
          .withColumn("ns", size(collect_set(col("l_suppkey")).over(w)))
          .withColumn("nls",
            size(collect_set(when(col("late"), col("l_suppkey"))).over(w)))
        lo.filter(col("late") && col("ns") >= 2 && col("nls") === 1)
          .join(T(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(T(s, dir, "nation")
            .filter(col("n_name") === "NATION_5")),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .groupBy("s_name")
          .agg(count(lit(1)).cast("long").as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      },
      Some(
        "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait " +
          "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
          "JOIN orders ON o_orderkey = l1.l_orderkey " +
          "JOIN nation ON s_nationkey = n_nationkey " +
          "WHERE o_orderstatus = 'F' AND n_name = 'NATION_5' " +
          "AND l1.l_shipdate > CAST(o_orderdate AS DATE) + 75 " +
          "AND EXISTS (SELECT 1 FROM lineitem l2 " +
          "WHERE l2.l_orderkey = l1.l_orderkey " +
          "AND l2.l_suppkey <> l1.l_suppkey) " +
          "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
          "WHERE l3.l_orderkey = l1.l_orderkey " +
          "AND l3.l_suppkey <> l1.l_suppkey " +
          "AND l3.l_shipdate > CAST(o_orderdate AS DATE) + 75) " +
          "GROUP BY s_name ORDER BY numwait DESC, s_name")
    ),
    Q(
      "sql_cte_pipeline",
      // the pure-SQL surface: a multi-CTE + window-function pipeline run
      // through spark.sql over a registered view — proves a user can
      // drive the engine with ANSI SQL alone (every other op here uses
      // the DataFrame API). Month×status revenue, share-of-month, rank.
      (s, dir) => {
        // query-unique view name: registering "orders" would shadow the
        // bare table name session-wide for any later spark.sql-based op
        T(s, dir, "orders").createOrReplaceTempView("sql_cte_orders")
        s.sql(
          "WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)" +
            " AS mo, o_orderstatus AS st, " +
            "sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents " +
            "FROM sql_cte_orders GROUP BY 1, 2) " +
            "SELECT mo, st, CAST(cents AS DOUBLE)/100.0 AS revenue, " +
            "round(100.0*cents/sum(cents) OVER (PARTITION BY mo) * 1e6)/1e6" +
            " AS share_pct, " +
            "CAST(rank() OVER (PARTITION BY mo ORDER BY cents DESC, st) AS BIGINT) AS rk " +
            "FROM m ORDER BY mo, st")
      },
      Some(
        "WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)" +
          " AS mo, o_orderstatus AS st, " +
          "sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents " +
          "FROM orders GROUP BY 1, 2) " +
          "SELECT mo, st, CAST(cents AS DOUBLE)/100.0 AS revenue, " +
          "round(100.0*cents/sum(cents) OVER (PARTITION BY mo) * 1e6)/1e6" +
          " AS share_pct, " +
          "CAST(rank() OVER (PARTITION BY mo ORDER BY cents DESC, st) AS BIGINT) AS rk " +
          "FROM m ORDER BY mo, st")
    ),
    Q(
      "q22_dormant_customers",
      // Q22 analog: above-average-balance customers with no recent orders,
      // rolled up by market segment. The average threshold is an exact
      // scaled-integer sum / count evaluated with the identical expression
      // tree on both engines, so boundary rows can't flip.
      (s, dir) => {
        val cust = T(s, dir, "customer")
        val thr = cust.filter(col("c_acctbal") > 0)
          .agg((sum(round(col("c_acctbal") * 100).cast("long"))
            .cast("double") / count(lit(1)) / 100.0).as("avg_bal"))
        cust.join(broadcast(thr))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(T(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).cast("long").as("numcust"),
            dsum(col("c_acctbal"), 2).as("totacctbal"))
          .orderBy("c_mktsegment")
      },
      Some(
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust, " +
          dsumSql("c_acctbal", 2) + " AS totacctbal " +
          "FROM customer WHERE c_acctbal > " +
          "(SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)" +
          "/count(*)/100.0 FROM customer WHERE c_acctbal > 0) " +
          "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
          "AND o_orderdate >= TIMESTAMP '1999-01-01') " +
          "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    )
  )
}
