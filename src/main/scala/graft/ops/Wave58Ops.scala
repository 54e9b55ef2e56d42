package graft.ops

import graft.{Q, QueryModule}
import graft.text.TextAlgs
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Round-10 wave 58: ONLINE near-duplicate detection — the streaming
  * twin of the `data_incremental_neardup` index, i.e. the shape a live
  * LLM-ingest pipeline runs: documents arrive on a stream, and each one
  * is checked against everything that arrived BEFORE it, in one pass,
  * with no batch re-scans.
  *
  * Dataflow: each document fans out to its 16 MinHash LSH band keys; the
  * stream is keyed by (band, bandhash) and a `transformWithState`
  * processor holds that bucket's members (id + sorted 64-bit token-hash
  * set) in typed ValueState. An arriving doc exact-verifies (merge-
  * intersect Jaccard, rounded 1e-6) against the CURRENT members, emits
  * any >= 0.8 matches, and joins the bucket — so state grows only with
  * bucket population (the LSH guarantee) and every emitted pair is
  * cross-arrival by construction. A pair colliding in several bands is
  * emitted per band; the read-back dedups. Within a micro-batch, bucket
  * rows process in doc_id order, so "arrived before" is deterministic.
  *
  * No oracle (seeded MinHash banding, per the SURVEY §2.10 declaration);
  * StreamNeardupSpec pins (a) equality with a driver-side replay of the
  * same banding + verification and (b) state carrying across
  * micro-batches (a batch-2 doc matches a batch-1 doc).
  *
  * MEASURED LIMITATION (same as text_dedup_mllib_lsh): this synthetic
  * corpus is LSH-adversarial — one shared vocabulary puts ~25% of ALL
  * pairs above 0.8 Jaccard, so buckets are dense and the within-bucket
  * verify degenerates quadratic (measured 207 s at sf0.1 unblocked,
  * ~30k true pairs at sf0.01). The op therefore streams the same
  * blocked slice as text_dedup_near; on a real corpus (sparse near-dup
  * structure) the unblocked form is the production shape.
  */
object Wave58Ops extends QueryModule {

  final case class DocIn(doc_id: Long, text: String)
  final case class BandRow(band: Int, bhash: Long, doc_id: Long,
      toks: Seq[Long])
  final case class BucketState(ids: Seq[Long], toks: Seq[Seq[Long]])
  final case class DupHit(doc_a: Long, doc_b: Long, jac: Double)

  /** Merge-intersect size of two sorted distinct long arrays. */
  private def lix(a: Seq[Long], b: Seq[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  private def jac6(a: Seq[Long], b: Seq[Long]): Double = {
    val inter = lix(a, b).toDouble
    math.round(inter / (a.length + b.length - inter) * 1e6) / 1e6
  }

  /** Per-bucket membership + verification, state carried across batches. */
  class NeardupProcessor
      extends StatefulProcessor[(Int, Long), BandRow, DupHit] {
    @transient private var st: ValueState[BucketState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BucketState]("bucket",
        Encoders.product[BucketState], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long),
        rows: Iterator[BandRow], tv: TimerValues): Iterator[DupHit] = {
      val cur =
        if (st.exists()) st.get() else BucketState(Nil, Nil)
      // mutable in-batch membership (an immutable :+ per row would copy
      // the bucket quadratically)
      val ids = scala.collection.mutable.ArrayBuffer(cur.ids: _*)
      val toks = scala.collection.mutable.ArrayBuffer(cur.toks: _*)
      val out = Seq.newBuilder[DupHit]
      rows.toArray.sortBy(_.doc_id).foreach { r =>
        var i = 0
        while (i < ids.length) {
          // size-ratio prune: J <= min/max, so len-skewed pairs cannot
          // reach 0.8 — the exactness-preserving filter the batch
          // minhash op uses
          val (lo, hi) =
            if (r.toks.length < toks(i).length)
              (r.toks.length.toLong, toks(i).length.toLong)
            else (toks(i).length.toLong, r.toks.length.toLong)
          if (lo * 10000000L >= hi * 7999995L) {
            val j = jac6(r.toks, toks(i))
            if (j >= 0.8) out += DupHit(ids(i), r.doc_id, j)
          }
          i += 1
        }
        ids += r.doc_id
        toks += r.toks
      }
      st.update(BucketState(ids.toSeq, toks.toSeq))
      out.result().iterator
    }
  }

  /** The keyed streaming pipeline (shared with the spec's MemoryStream
    * twin test). */
  def neardupStream(in: Dataset[DocIn]): Dataset[DupHit] = {
    import in.sparkSession.implicits._
    in.flatMap { d =>
        val dist = d.text.split(" ").toSeq.distinct
        val toks = dist.map(TextAlgs.tokenHash64).sorted
        TextAlgs.lshBands(TextAlgs.minhash(dist)).map { case (b, h) =>
          BandRow(b, h, d.doc_id, toks)
        }
      }
      .groupByKey(r => (r.band, r.bhash))
      .transformWithState(new NeardupProcessor, TimeMode.None(),
        OutputMode.Append())(Encoders.product[DupHit])
  }

  def queries: Seq[Q] = Seq(
    Q(
      "stream_neardup_live",
      (s, dir) => {
        import org.apache.spark.sql.types._
        import s.implicits._
        val name = s"live_neardup_${System.nanoTime()}"
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        graft.StreamRun.withStateParts(s) {
          s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
            "state.RocksDBStateStoreProvider")
          try {
            val schema = StructType(Seq(
              StructField("doc_id", LongType),
              StructField("text", StringType),
              StructField("lang", StringType),
              StructField("source", StringType),
              StructField("n_chars", LongType)))
            val in = s.readStream.schema(schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(dir)
              // blocked slice (see MEASURED LIMITATION above)
              .filter(col("lang") === "en" &&
                col("source").isin("src0", "src1"))
              .select(col("doc_id"), col("text")).as[DocIn]
            val q = neardupStream(in).toDF()
              .writeStream.format("memory").queryName(name)
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          } finally prev match {
            case Some(p) => s.conf.set(key, p)
            case None => s.conf.unset(key)
          }
        }
        // a pair colliding in several bands emits once per band
        s.table(name).distinct().orderBy("doc_a", "doc_b")
      },
      None
    )
  )
}
