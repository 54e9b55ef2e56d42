package graft.ops

import graft.{Q, QueryModule, T, StreamRun}
import org.apache.spark.sql.functions._

/** `stream_psi_monitor_live`: online drift monitoring as a real
  * Structured Streaming job — the production shape of wave-10's PSI.
  *
  * The stream maintains ONLY per-(day, bin) counts (10 fixed value bins;
  * incremental stateful aggregation, state is days×10 rows); the PSI
  * against the broadcast baseline distribution is a constant-size batch
  * epilogue over the materialized counts — the alerting stage reads 10
  * rows per day, never the event stream. Bin edges come from the static
  * baseline scan, as a deployed monitor's would (frozen at deploy time).
  * Laplace-smoothed shares, per-term 1e9 quantization, integer sums —
  * the same determinism contract as stats_psi_drift, so the whole
  * stream+epilogue pipeline shares one SQL oracle.
  */
object Wave10bOps extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "stream_psi_monitor_live",
      (s, dir) => {
        val base = T(s, dir, "events").select(col("value"))
        val mm = base.agg(min("value"), max("value")).collect()(0)
        val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
        val width = math.max((hi - lo) / 10.0, 1e-9)
        def binOf(c: org.apache.spark.sql.Column) =
          least(floor((c - lo) / width).cast("long"), lit(9L))
        val baseline = base.groupBy(binOf(col("value")).as("bin"))
          .agg(count(lit(1)).as("cb"))
        val nb = base.count()
        val name = s"live_psi_${System.nanoTime()}"
        StreamRun.withStateParts(s) {
          val q = EventOps.liveEvents(s, dir)
            .groupBy(window(col("ts"), "1 day").as("w"),
              binOf(col("value")).as("bin"))
            .agg(count(lit(1)).as("c"))
            .select(col("w.start").cast("timestamp_ntz").as("win_start"),
              col("bin"), col("c"))
            .writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        val daily = s.table(name)
        val perDay = org.apache.spark.sql.expressions.Window
          .partitionBy("win_start")
        val p = (col("c") + 1).cast("double") / (col("n_day") + 10)
        val q_ = (col("cb") + 1).cast("double") / (nb + 10).toDouble
        daily.join(broadcast(baseline), "bin")
          .withColumn("n_day", sum("c").over(perDay))
          .select(col("win_start"), col("n_day"),
            round((p - q_) * log(p / q_) * 1e9).cast("long").as("term"))
          .groupBy("win_start", "n_day")
          .agg((round(sum("term") / 1e9 * 1e6) / 1e6).as("psi"))
          .select(col("win_start"), col("n_day").as("n"), col("psi"))
          .orderBy("win_start")
      },
      Some(
        "WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS t, value " +
          "FROM events), " +
          "mm AS (SELECT min(value) AS lo, " +
          "greatest((max(value) - min(value)) / 10.0, 1e-9) AS w, " +
          "count(*) AS nb FROM ev), " +
          "binned AS (SELECT CAST(date_trunc('day', t) AS TIMESTAMP) " +
          "AS win_start, " +
          "least(CAST(floor((value - (SELECT lo FROM mm)) " +
          "/ (SELECT w FROM mm)) AS BIGINT), 9) AS bin FROM ev), " +
          "baseline AS (SELECT least(CAST(floor((value - " +
          "(SELECT lo FROM mm)) / (SELECT w FROM mm)) AS BIGINT), 9) " +
          "AS bin, count(*) AS cb FROM ev GROUP BY 1), " +
          "daily AS (SELECT win_start, bin, count(*) AS c FROM binned " +
          "GROUP BY 1, 2), " +
          "dn AS (SELECT win_start, sum(c) AS n_day FROM daily " +
          "GROUP BY 1), " +
          "terms AS (SELECT d.win_start, dn.n_day, CAST(round(" +
          "(CAST(d.c + 1 AS DOUBLE) / (dn.n_day + 10) - " +
          "CAST(b.cb + 1 AS DOUBLE) / ((SELECT nb FROM mm) + 10)) * " +
          "ln((CAST(d.c + 1 AS DOUBLE) / (dn.n_day + 10)) / " +
          "(CAST(b.cb + 1 AS DOUBLE) / ((SELECT nb FROM mm) + 10))) " +
          "* 1e9) AS BIGINT) AS term " +
          "FROM daily d JOIN baseline b ON d.bin = b.bin " +
          "JOIN dn ON d.win_start = dn.win_start) " +
          "SELECT win_start, CAST(n_day AS BIGINT) AS n, " +
          "round(sum(term) / 1e9 * 1e6) / 1e6 AS psi " +
          "FROM terms GROUP BY win_start, n_day ORDER BY win_start")
    )
  )
}
