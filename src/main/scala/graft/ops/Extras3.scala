package graft.ops

import graft.{Q, QueryModule, StreamRun, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Round-3 engine-surface wave: sketch-backed top-k, URL parsing,
  * histogram bucketing, and state-store introspection.
  *
  * Scale notes: `approx_top_k` is a constant-size mergeable summary (the
  * heavy-hitters analog of the HLL/CMS family already shipped) — partials
  * merge on the exchange, no row shuffle. `stream_state_reader` is the ops
  * tool every long-running stateful pipeline needs: the checkpoint's state
  * store read back as a DataFrame, verified here against the batch answer
  * over the same input — state is DATA, not a black box.
  */
object Extras3 extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "agg_approx_topk",
      // approx_top_k heavy hitters. With 5 distinct values the sketch's
      // default capacity (10k tracked items) makes the counts EXACT, so
      // the op is oracle-checked against the exact group-count top-3 (no
      // tie at any fixture SF — verified; ordering key (n DESC, value)
      // is total either way).
      (s, dir) =>
        T(s, dir, "events")
          .select(expr("inline(approx_top_k(event_type, 3))"))
          .select(col("item").as("event_type"),
            col("count").as("n"))
          .orderBy(col("n").desc, col("event_type")),
      Some(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events " +
          "GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3")
    ),
    Q(
      "fn_url",
      // parse_url family over URLs derived from fixture fields; the oracle
      // reconstructs each component from the same fields, so the Spark
      // parser is checked against ground truth, not another parser.
      (s, dir) =>
        T(s, dir, "documents")
          .withColumn("url",
            concat(lit("https://"), col("source"), lit(".example.com/d/"),
              col("doc_id"), lit("?k="), pmod(col("doc_id"), lit(10))))
          .select(
            col("doc_id"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY"), lit("k")).as("k"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, source || '.example.com' AS host, " +
          "'/d/' || CAST(doc_id AS VARCHAR) AS path, " +
          "CAST(doc_id % 10 AS VARCHAR) AS k " +
          "FROM documents ORDER BY doc_id")
    ),
    Q(
      "fn_histogram",
      // width_bucket histogram of order totals: 12 equal buckets over
      // [0, 600k) plus the overflow bucket — the one-pass distribution
      // summary; the oracle mirrors the same half-open bucket arithmetic.
      (s, dir) =>
        T(s, dir, "orders")
          .select(width_bucket(col("o_totalprice"), lit(0), lit(600000),
            lit(12)).as("bucket"), col("o_totalprice"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))
          .orderBy("bucket"),
      Some(
        "SELECT CAST(least(floor(o_totalprice / 50000) + 1, 13) AS BIGINT) " +
          "AS bucket, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("o_totalprice", 2) + " AS total " +
          "FROM orders GROUP BY 1 ORDER BY bucket")
    ),
    Q(
      "stream_state_reader",
      // State-store introspection: run the windowless streaming count with
      // an explicit checkpoint, then read the checkpoint's STATE STORE as
      // a DataFrame (statestore source) — the per-key state must equal the
      // batch aggregate over the same input. Exactly-once made auditable.
      (s, dir) => {
        val ck = graft.Tmp.dir("graft_ck_ssr")
        StreamRun.withStateParts(s) {
          val q = EventOps.liveEvents(s, dir)
            .groupBy("event_type")
            .agg(count(lit(1)).as("n"))
            .writeStream.format("memory")
            .queryName(s"ssr_${System.nanoTime()}")
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.read.format("statestore").load(ck)
          .select(col("key.event_type").as("event_type"),
            col("value.count").as("n"))
          .orderBy("event_type")
      },
      Some(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events " +
          "GROUP BY event_type ORDER BY event_type")
    )
  )
}
