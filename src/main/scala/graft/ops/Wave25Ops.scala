package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Round-7 wave 25: pipeline-curation dedup surfaces and the outer
  * stream-stream join.
  *
  *  - `text_dedup_url` is URL-canonicalization dedup — the first pass of
  *    every web-crawl pipeline (the fixture corpus has no URL column, so
  *    deterministic URL-shaped strings are synthesized from doc metadata,
  *    the same house pattern as `text_pii_scrub`). Canonicalization is a
  *    pure codegen'd regexp pass: lowercase scheme+host, strip the
  *    default port, drop tracking params (utm prefix and ref), keep identifying
  *    params, strip trailing slash. Dedup is then an exact groupBy on
  *    the canonical form — linear, partial-aggregable, no shuffle
  *    beyond the one hash exchange. At 100 TB this is the cheap pass
  *    that runs BEFORE content hashing: a URL-level group collapses
  *    recrawls without touching document bytes.
  *  - `mm_dedup_bytes` is exact dedup of opaque BINARY payloads (the
  *    multimodal analog of `text_dedup_exact`): md5 over the payload
  *    bytes map-side, then a fingerprint groupBy — payload bytes never
  *    shuffle, only the 32-char digest does. The oracle hashes the same
  *    UTF-8 bytes from the string side.
  *  - `stream_stream_outer_live` is the LEFT OUTER stream⋈stream
  *    interval join — the append-mode shape where unmatched left rows
  *    emit with nulls only after the watermark proves no match can
  *    arrive. State on both sides is bounded by the watermark delay +
  *    join window exactly as in the inner form. Determinism: emission
  *    of an unmatched row depends on where the final watermark lands,
  *    so the post-stream batch filter keeps only clicks whose join
  *    window PROVABLY closed a safety margin before the final
  *    watermark (cts ≤ max(ts) − 2h1m) — inside that horizon streamed
  *    and batch left joins agree row-for-row, which is what the oracle
  *    checks.
  */
object Wave25Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "text_dedup_url",
      (s, dir) => {
        val urls = T(s, dir, "documents").select(
          col("doc_id"),
          concat(
            lit("HTTPS://WWW."), upper(col("source")),
            lit(".Example.COM:443/docs/"),
            (col("doc_id") % 40).cast("string"),
            lit("?utm_source=feed&ref="),
            (col("doc_id") % 7).cast("string"),
            lit("&id="), (col("doc_id") % 5).cast("string"))
            .as("url"))
        val scheme = lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1))
        val host = lower(regexp_replace(
          regexp_extract(col("url"), "^[A-Za-z]+://([^/?]+)", 1),
          ":443$", ""))
        val path = regexp_replace(
          regexp_extract(col("url"), "^[A-Za-z]+://[^/?]+([^?]*)", 1),
          "/$", "")
        val idp = regexp_extract(col("url"), "[?&](id=[0-9]+)", 1)
        urls
          .withColumn("canon", concat(scheme, lit("://"), host, path,
            when(length(idp) > 0, concat(lit("?"), idp)).otherwise(lit(""))))
          .groupBy("canon")
          .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))
          .filter(col("n_copies") >= 2)
          .orderBy("canon")
      },
      Some(
        "WITH urls AS (SELECT doc_id, 'HTTPS://WWW.' || upper(source) || " +
          "'.Example.COM:443/docs/' || CAST(doc_id % 40 AS VARCHAR) || " +
          "'?utm_source=feed&ref=' || CAST(doc_id % 7 AS VARCHAR) || " +
          "'&id=' || CAST(doc_id % 5 AS VARCHAR) AS url FROM documents), " +
          "canon AS (SELECT doc_id, " +
          "lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' || " +
          "lower(regexp_replace(regexp_extract(url, '^[A-Za-z]+://([^/?]+)', 1), ':443$', '')) || " +
          "regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?]+([^?]*)', 1), '/$', '') || " +
          "CASE WHEN length(regexp_extract(url, '[?&](id=[0-9]+)', 1)) > 0 " +
          "THEN '?' || regexp_extract(url, '[?&](id=[0-9]+)', 1) ELSE '' END " +
          "AS canon FROM urls) " +
          "SELECT canon, CAST(count(*) AS BIGINT) AS n_copies, " +
          "min(doc_id) AS keep_id FROM canon GROUP BY canon " +
          "HAVING count(*) >= 2 ORDER BY canon")
    ),
    Q(
      "mm_dedup_bytes",
      // per-source payload-uniqueness audit (exact duplicates only appear
      // in the larger fixture generations, so the output is the per-group
      // digest census rather than the dup groups themselves — same
      // machinery, scale-stable shape)
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("source"),
            md5(encode(col("text"), "UTF-8")).as("content_md5"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_payloads"),
            countDistinct(col("content_md5")).as("n_uniq"),
            (count(lit(1)) - countDistinct(col("content_md5")))
              .as("n_dups"))
          .orderBy("source"),
      Some(
        "SELECT source, CAST(count(*) AS BIGINT) AS n_payloads, " +
          "CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_uniq, " +
          "CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dups " +
          "FROM documents GROUP BY source ORDER BY source")
    ),
    Q(
      "stream_stream_outer_live",
      (s, dir) => {
        val name = s"live_ssoj_${System.nanoTime()}"
        val ev = EventOps.liveEvents(s, dir)
          .withColumn("ts", col("ts").cast("timestamp"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("ts").as("cts"),
            col("event_id").as("cid"))
          .withWatermark("cts", "1 hour")
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts").as("pts"),
            col("event_id").as("pid"))
          .withWatermark("pts", "1 hour")
        graft.StreamRun.withStateParts(s) {
          val q = clicks.join(buys,
              col("cu") === col("pu") &&
                col("pts") >= col("cts") &&
                col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"),
              "leftOuter")
            .select(col("cu"), col("cts"), col("cid"), col("pid"))
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        // keep only clicks whose join window provably closed before the
        // final watermark (margin 1 min past the 1h delay + 1h window).
        // The final watermark is the MIN over both inputs' per-side max
        // event time (each side advances its own watermark column), so
        // the horizon anchors on least(max click ts, max purchase ts) —
        // inside it every unmatched click has emitted its null row and
        // streamed == batch left join.
        val m = T(s, dir, "events")
          .agg(least(
            max(when(col("event_type") === "click",
              col("ts").cast("timestamp"))),
            max(when(col("event_type") === "purchase",
              col("ts").cast("timestamp"))))).first().getTimestamp(0)
        s.table(name)
          .filter(col("cts") <= lit(m) - expr("INTERVAL 121 MINUTES"))
          .groupBy(col("cu").as("user_id"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("pid")).as("n_matched"),
            (count(lit(1)) - count(col("pid"))).as("n_unmatched"))
          .orderBy("user_id")
      },
      Some(
        "WITH mx AS (SELECT least(" +
          "max(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END), " +
          "max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)" +
          ") AS m FROM events), " +
          "c AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS cts " +
          "FROM events, mx WHERE event_type = 'click' " +
          "AND CAST(ts AS TIMESTAMP) <= m - INTERVAL 121 MINUTE), " +
          "p AS (SELECT user_id AS pu, event_id AS pid, " +
          "CAST(ts AS TIMESTAMP) AS pts FROM events " +
          "WHERE event_type = 'purchase') " +
          "SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_rows, " +
          "CAST(count(pid) AS BIGINT) AS n_matched, " +
          "CAST(count(*) - count(pid) AS BIGINT) AS n_unmatched " +
          "FROM c LEFT JOIN p ON c.user_id = pu " +
          "AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR " +
          "GROUP BY c.user_id ORDER BY c.user_id")
    )
  )
}
