package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det.{dsum, dsumSql}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 9: privacy tokenization, changepoint localization, and
  * data-contract auditing.
  *
  *  - `data_pseudonymize`: salted-hash tokenization of the user key in
  *    BOTH the fact and dimension tables — the privacy verb that keeps
  *    referential integrity: the join on pseudonyms yields exactly the
  *    join on raw keys, while no raw key appears in either output. md5 is
  *    the cross-engine-portable digest (the oracle replays it).
  *  - `ts_changepoint_cusum`: CUSUM changepoint per event type over the
  *    daily count series — argmax_t |Σ_{i≤t}(c_i − mean)|, the standard
  *    mean-shift locator. All cumulative math on integer counts scaled by
  *    n (Σc_i·n − t·S stays integral), so the argmax is exact and the
  *    tie-break (earliest day) is total.
  *  - `data_quality_rules`: a data-contract audit — one pass computes the
  *    violation count of each declared rule (positivity, range, set
  *    membership, referential integrity into customer) as a conditional
  *    aggregate; the anti-join rule broadcasts the dimension key set. The
  *    shape every ingestion gate runs before publishing a batch.
  */
object Wave9Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "data_pseudonymize",
      (s, dir) => {
        val salt = "graft-2026"
        val ev = T(s, dir, "events")
          .select(md5(concat(lit(salt), col("user_id").cast("string")))
            .as("pid"),
            col("value"))
        val cust = T(s, dir, "customer")
          .select(md5(concat(lit(salt), col("c_custkey").cast("string")))
            .as("pid"),
            col("c_mktsegment"))
        ev.join(cust, "pid")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            countDistinct("pid").as("n_users"),
            dsum(col("value"), 2).as("sum_val"))
          .orderBy("c_mktsegment")
      },
      Some(
        "WITH ev AS (SELECT md5('graft-2026' || CAST(user_id AS VARCHAR)) " +
          "AS pid, value FROM events), " +
          "cust AS (SELECT md5('graft-2026' || CAST(c_custkey AS VARCHAR)) " +
          "AS pid, c_mktsegment FROM customer) " +
          "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(count(DISTINCT ev.pid) AS BIGINT) AS n_users, " +
          dsumSql("value", 2) + " AS sum_val " +
          "FROM ev JOIN cust ON ev.pid = cust.pid " +
          "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    ),
    Q(
      "ts_changepoint_cusum",
      (s, dir) => {
        val daily = T(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val byType = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy("event_type")
        // scale by n: cusum_t = n·Σ_{i≤t} c_i − t·S is integral, so the
        // max and its argmax are exact; earliest-day tie-break is total
        val scored = daily
          .withColumn("t", count(lit(1)).over(byType))
          .withColumn("run", sum("c").over(byType))
          .withColumn("n", count(lit(1)).over(tot))
          .withColumn("s", sum("c").over(tot))
          .withColumn("dev",
            abs(col("run") * col("n") - col("t") * col("s")))
        val rk = Window.partitionBy("event_type")
          .orderBy(col("dev").desc, col("d").asc)
        scored.withColumn("rk", row_number().over(rk))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("d").cast("date").as("cp_day"),
            col("dev").as("dev_scaled"), col("n").as("n_days"))
          .orderBy("event_type")
      },
      Some(
        "WITH daily AS (SELECT event_type, " +
          "date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, " +
          "count(*) AS c FROM events GROUP BY 1, 2), " +
          "scored AS (SELECT event_type, d, " +
          "count(*) OVER wt AS t, sum(c) OVER wt AS run, " +
          "count(*) OVER wp AS n, sum(c) OVER wp AS s " +
          "FROM daily WINDOW " +
          "wt AS (PARTITION BY event_type ORDER BY d " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
          "wp AS (PARTITION BY event_type)), " +
          "dev AS (SELECT event_type, d, " +
          "CAST(abs(run * n - t * s) AS BIGINT) AS dev_scaled, " +
          "CAST(n AS BIGINT) AS n_days, " +
          "row_number() OVER (PARTITION BY event_type " +
          "ORDER BY abs(run * n - t * s) DESC, d ASC) AS rk FROM scored) " +
          "SELECT event_type, CAST(d AS DATE) AS cp_day, dev_scaled, " +
          "n_days FROM dev WHERE rk = 1 ORDER BY event_type")
    ),
    Q(
      "data_quality_rules",
      (s, dir) => {
        val custKeys = T(s, dir, "customer").select(
          col("c_custkey").as("o_custkey"))
        val o = T(s, dir, "orders")
          .join(broadcast(custKeys.withColumn("known", lit(1))),
            Seq("o_custkey"), "left")
        val rules = Seq(
          ("price_positive", col("o_totalprice") <= 0),
          ("status_in_set", !col("o_orderstatus").isin("O", "F", "P")),
          ("date_in_range",
            col("o_orderdate") < "1992-01-01" ||
              col("o_orderdate") >= "2002-01-01"),
          ("custkey_known", col("known").isNull),
          ("priority_nonnull", col("o_orderpriority").isNull))
        val agg = o.agg(count(lit(1)).as("n_rows"),
          rules.map { case (name, bad) =>
            sum(when(bad, 1L).otherwise(0L)).as(s"viol_$name")
          }: _*)
        agg.select(col("n_rows") +:
          rules.map { case (name, _) => col(s"viol_$name") }: _*)
      },
      Some(
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
          "CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS viol_price_positive, " +
          "CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS viol_status_in_set, " +
          "CAST(sum(CASE WHEN o_orderdate < DATE '1992-01-01' OR " +
          "o_orderdate >= DATE '2002-01-01' THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS viol_date_in_range, " +
          "CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS viol_custkey_known, " +
          "CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS viol_priority_nonnull " +
          "FROM orders LEFT JOIN customer ON o_custkey = c_custkey")
    )
  )
}
