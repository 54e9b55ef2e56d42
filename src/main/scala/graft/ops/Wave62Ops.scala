package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-12 wave 62: streaming ingestion into the ACID near-dup index —
  * the cadence that closes the loop between `stream_neardup_live`
  * (online detection, state in the stream checkpoint) and
  * `data_incremental_neardup` (snapshot-incremental, state in SnapTxn-
  * pinned SnapTables).
  *
  *  - `stream_neardup_index`: documents arrive as FILES on a landing
  *    dir; each micro-batch featurizes ONLY its own rows, probes the
  *    tx-pinned bucket index for candidates, exact-verifies by Jaccard,
  *    and absorbs corpus + buckets + toksets + matches in ONE SnapTxn
  *    commit whose note records the micro-batch id. Durability lives in
  *    the TABLES, not the stream state: the checkpoint tracks only file
  *    offsets, so a restarted (or re-played) micro-batch re-enters
  *    `StreamIndex.ingest`, finds its own note already published, and
  *    SKIPS — exactly-once absorb without relying on sink-side state
  *    (the txn log is the idempotency ledger, Delta's
  *    `txn`/`foreachBatch` pattern re-derived). A crash mid-absorb
  *    leaves only unpinned per-table orphans (readers stay on the prior
  *    pin set; `SnapTxn.vacuumOrphans` reclaims), so the index can
  *    never tear across the four tables.
  *
  * At 100 TB/day this is the production shape: landing files → one
  * transactional probe+absorb per micro-batch, per-batch cost
  * O(batch + matching buckets) — the corpus is never re-read, and every
  * downstream consumer (including the live detector's bootstrap) reads
  * a cross-table-consistent snapshot. No oracle (seeded MinHash banding
  * prunes candidates — the declared §2.10 class); StreamIndexSpec pins
  * ingest-vs-library equality, idempotent replay, restart durability,
  * and the pin lockstep across all four tables.
  */
object Wave62Ops extends QueryModule {

  /** The transactional ingest cadence, factored out of the streaming
    * sink so specs (and a restarted query) drive it directly. */
  object StreamIndex {
    import graft.sources.{SnapTable, SnapTxn}

    /** DDL-first setup: four EMPTY SnapTables (corpus, buckets,
      * toksets, matches) under one tx root, pinned together at tx v1.
      * Schemas derive from the shared IncNeardup plans on a zero-row
      * slice — plan-only, no jobs. */
    def setup(s: SparkSession, txroot: String, docs: DataFrame): Unit = {
      val f0 = IncNeardup.featurize(docs.limit(0))
      SnapTable.createEmpty(s"$txroot/corpus", docs.schema, "doc_id")
      SnapTable.createEmpty(s"$txroot/buckets",
        IncNeardup.bucketRows(f0).schema, "doc_id")
      SnapTable.createEmpty(s"$txroot/toksets",
        f0.select(col("doc_id"), col("tokset")).schema, "doc_id")
      SnapTable.createEmpty(s"$txroot/matches",
        IncNeardup.verify(
          IncNeardup.candidates(f0, IncNeardup.bucketRows(f0)),
          f0, f0.select(col("doc_id"), col("tokset"))).schema, "new_id")
      SnapTxn.init(txroot, Seq("corpus", "buckets", "toksets", "matches"))
    }

    /** True iff `batchId`'s absorb already published — the replay guard.
      * The txn log is the ledger: one note per absorbed micro-batch. */
    def absorbed(txroot: String, batchId: Long): Boolean =
      SnapTxn.txVersions(txroot)
        .exists(v => SnapTxn.load(txroot, v).note == note(batchId))

    private def note(batchId: Long): String = s"absorb:b$batchId"

    /** One micro-batch: probe the PINNED index, verify, absorb all four
      * tables in one transaction. Idempotent — a replayed batch id is a
      * no-op. Returns the number of verified cross-commit pairs (-1 for
      * a skipped replay). */
    def ingest(s: SparkSession, txroot: String, b: DataFrame,
        batchId: Long): Long = {
      if (absorbed(txroot, batchId)) return -1L
      import graft.sources.SnapTxn
      val fd = IncNeardup.featurize(b).persist()
      try {
        // populate the cache with ONE dedicated job before the verify
        // plan consumes fd on two branches (same discipline as the
        // batch op: branches of one job race the cache)
        fd.count()
        val hits = IncNeardup.verify(
          IncNeardup.candidates(fd, SnapTxn.read(s, txroot, "buckets")),
          fd, SnapTxn.read(s, txroot, "toksets")).persist()
        try {
          // pin the hits BEFORE the absorb moves the index under them —
          // and make the timed path pay the real candidates+verify cost
          val n = hits.count()
          SnapTxn.commit(s, txroot, Seq(
            "corpus" -> b,
            "buckets" -> IncNeardup.bucketRows(fd),
            "toksets" -> fd.select(col("doc_id"), col("tokset")),
            "matches" -> hits.toDF()),
            note = note(batchId))
          n
        } finally hits.unpersist(blocking = false)
      } finally fd.unpersist(blocking = false)
    }
  }

  def queries: Seq[Q] = Seq(
    Q(
      "stream_neardup_index",
      (s, dir) => {
        import graft.sources.SnapTxn
        val txroot = graft.Tmp.dir("graft_streamnd_tx")
        val src = graft.Tmp.dir("graft_streamnd_src")
        val ckpt = graft.Tmp.dir("graft_streamnd_ckpt")
        val docs = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"))
        StreamIndex.setup(s, txroot, docs)
        def runOnce(): Unit = {
          val q = s.readStream.schema(docs.schema).parquet(src)
            .writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, id: Long) =>
              StreamIndex.ingest(s, txroot, b, id); ()
            }
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        // two file waves; each AvailableNow run drains only the NEW
        // arrivals through the shared checkpoint (the nightly-ETL-as-a-
        // stream pattern stream_available_now pins). A quarter-corpus
        // slice per wave: the capability under test is the transactional
        // cadence — data_incremental_neardup already pays the full
        // adversarial-corpus probe cost in this same suite
        docs.filter(col("doc_id") % 4 === 0)
          .write.mode("append").parquet(src)
        runOnce() // micro-batch 0: probes the empty index, absorbs
        docs.filter(col("doc_id") % 4 === 1)
          .write.mode("append").parquet(src)
        runOnce() // micro-batch 1: probes wave-0's index, absorbs
        // head pins: init=1, absorb b0=2, absorb b1=3 — the witness that
        // exactly two transactions published
        require(SnapTxn.latestTx(txroot) == 3,
          s"expected tx head 3, got ${SnapTxn.latestTx(txroot)}")
        // read through the FINAL pin set: cross-table-consistent
        val corpus = SnapTxn.read(s, txroot, "corpus")
        val flagged = SnapTxn.read(s, txroot, "matches")
          .groupBy(col("new_id").as("doc_id"))
          .agg(count(lit(1)).as("n_matches"))
        corpus.join(flagged, Seq("doc_id"), "left")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("n_matches").isNotNull, 1L).otherwise(0L))
              .as("n_neardup"),
            sum(coalesce(col("n_matches"), lit(0L))).as("n_pairs"))
          .orderBy("lang")
      },
      None
    )
  )
}
