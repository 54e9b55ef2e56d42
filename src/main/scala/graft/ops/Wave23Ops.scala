package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Round-7 wave 23: the bounded-state streaming dedup.
  *
  * `stream_dedup_wm_live`: `dropDuplicatesWithinWatermark` — the
  * production form of streaming dedup. Plain `dropDuplicates` keeps
  * EVERY key forever (state grows without bound; the op
  * `stream_dedup_live` documents that); the within-watermark variant
  * evicts keys once the watermark passes them, so state is bounded by
  * the dedup horizon × key arrival rate — the only shape that survives
  * an unbounded stream. With the horizon wider than the replayed
  * history the result equals full DISTINCT, which is what the oracle
  * checks; the BOUNDED-STATE claim is the operator choice itself
  * (Spark evicts per watermark — the same run with a 1-minute horizon
  * is the production configuration).
  */
object Wave23Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "stream_dedup_wm_live",
      (s, dir) => {
        val name = s"live_dedup_wm_${System.nanoTime()}"
        graft.StreamRun.withStateParts(s) {
          val q = EventOps.liveEvents(s, dir)
            // watermarks require TIMESTAMP (tz-bearing); the NTZ event
            // time casts under the pinned-UTC session
            .withColumn("wts", col("ts").cast("timestamp"))
            .withColumn("minute_bucket", date_trunc("minute", col("ts")))
            .withWatermark("wts", "40 days") // horizon > replayed span
            .dropDuplicatesWithinWatermark(
              "user_id", "event_type", "minute_bucket")
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.table(name)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_keys"))
          .orderBy("event_type")
      },
      Some(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_keys FROM " +
          "(SELECT DISTINCT user_id, event_type, " +
          "date_trunc('minute', CAST(ts AS TIMESTAMP)) FROM events) t " +
          "GROUP BY event_type ORDER BY event_type")
    )
  )
}
