package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 wave 58: corpus packing.
  *
  *  - `data_shard_manifest`: greedy sequential shard packing — per
  *    language, documents in doc_id order fill size-targeted shards
  *    (shard = bytes-before // target, the running-sum formulation of
  *    greedy bin-filling with a deterministic order). Emits the shard
  *    MANIFEST (lang, shard, n_docs, bytes) a training job consumes. At
  *    100 TB this is one window over a per-lang sort — the same plan a
  *    date-partitioned writer uses — and the manifest is metadata-sized.
  *    Exact integer arithmetic end-to-end.
  *
  * (A `ts_burstiness` Fano-factor op was drafted here and dropped:
  * `events_burstiness` (Wave7Ops) already reports the same dispersion
  * statistic on the same hourly buckets.)
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
    )
  )
}
