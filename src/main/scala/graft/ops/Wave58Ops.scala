package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 wave 58: corpus packing + traffic shape.
  *
  *  - `data_shard_manifest`: greedy sequential shard packing — per
  *    language, documents in doc_id order fill size-targeted shards
  *    (shard = bytes-before // target, the running-sum formulation of
  *    greedy bin-filling with a deterministic order). Emits the shard
  *    MANIFEST (lang, shard, n_docs, bytes) a training job consumes. At
  *    100 TB this is one window over a per-lang sort — the same plan a
  *    date-partitioned writer uses — and the manifest is metadata-sized.
  *    Exact integer arithmetic end-to-end.
  *  - `ts_burstiness`: per-event-type Fano factor (sample variance /
  *    mean of hourly counts) — the dispersion index that separates
  *    Poisson-ish traffic (F≈1) from bursty traffic (F>>1). All moments
  *    are exact int64 sums; one double expression per type, rounded.
  */
object Wave58Ops extends QueryModule {

  /** Fixture-sized shard target (bytes) — small enough that every lang
    * genuinely splits into multiple shards at sf0.001+ (the packing law
    * is what's under test); production would use ~512 MB. */
  val ShardTarget = 4096L

  def queries: Seq[Q] = Seq(
    Q(
      "data_shard_manifest",
      (s, dir) => {
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        T(s, dir, "documents")
          .select(col("lang"), col("doc_id"),
            octet_length(col("text")).cast("long").as("bytes"))
          .withColumn("before",
            coalesce(sum("bytes").over(w), lit(0L)))
          .withColumn("shard",
            floor(col("before").cast("double") / ShardTarget)
              .cast("long"))
          .groupBy("lang", "shard")
          .agg(count(lit(1)).as("n_docs"), sum("bytes").as("bytes"))
          .orderBy("lang", "shard")
      },
      Some(
        "WITH t AS (SELECT lang, doc_id, " +
          "CAST(strlen(text) AS BIGINT) AS bytes FROM documents), " +
          "c AS (SELECT lang, bytes, COALESCE(sum(bytes) OVER (" +
          "PARTITION BY lang ORDER BY doc_id ROWS BETWEEN UNBOUNDED " +
          "PRECEDING AND 1 PRECEDING), 0) AS before FROM t), " +
          "sh AS (SELECT lang, bytes, " +
          s"CAST(floor(CAST(before AS DOUBLE) / $ShardTarget) AS BIGINT) " +
          "AS shard FROM c) " +
          "SELECT lang, shard, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(bytes) AS BIGINT) AS bytes FROM sh " +
          "GROUP BY lang, shard ORDER BY lang, shard")
    ),
    Q(
      "ts_burstiness",
      (s, dir) => {
        val hourly = T(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("x"))
        hourly.groupBy("event_type")
          .agg(count(lit(1)).as("k"), sum("x").as("s1"),
            sum(col("x") * col("x")).as("s2"))
          .filter(col("k") >= 2)
          .select(col("event_type"), col("k").as("n_hours"),
            dround(col("s1").cast("double") / col("k"), 6).as("mean"),
            dround((col("k") * col("s2") - col("s1") * col("s1"))
              .cast("double") /
              (col("k") * (col("k") - 1)) /
              (col("s1").cast("double") / col("k")), 6).as("fano"))
          .orderBy("event_type")
      },
      Some(
        "WITH h AS (SELECT event_type, date_trunc('hour', " +
          "CAST(ts AS TIMESTAMP)) AS hr, CAST(count(*) AS BIGINT) AS x " +
          "FROM events GROUP BY 1, 2), " +
          "m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k, " +
          "CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x * x) AS BIGINT) " +
          "AS s2 FROM h GROUP BY 1 HAVING count(*) >= 2) " +
          "SELECT event_type, k AS n_hours, " +
          droundSql("CAST(s1 AS DOUBLE) / k", 6) + " AS mean, " +
          droundSql("CAST(k * s2 - s1 * s1 AS DOUBLE) / " +
            "(k * (k - 1)) / (CAST(s1 AS DOUBLE) / k)", 6) +
          " AS fano FROM m ORDER BY event_type")
    )
  )
}
