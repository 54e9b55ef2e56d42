package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) modeled as opaque
  * `binary` payload columns with typed metadata, processed in partition-
  * sized batches via `mapPartitions` (the Scala analog of `mapInPandas`).
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecode`) — the Spark-side
  * plumbing (binary schema, partition batching, typed output schema) is
  * real and oracle-/test-checked. Swapping `fakeDecode` for a JNI/codec
  * call changes nothing else.
  *
  * Scale notes: binary payloads never shuffle here — features are extracted
  * map-side and only the small typed outputs flow on. At 100 TB the payload
  * column stays parquet-encoded until the mapPartitions touches it.
  */
object MultimodalOps extends QueryModule {

  final case class BinFeat(doc_id: Long, n_bytes: Long, head: Long)
  final case class DecodedFeat(doc_id: Long, mean_byte: Double,
      max_byte: Long, frames: Long)

  /** STUB for the real media decode — deterministic byte statistics
    * standing in for pixel/sample features.
    */
  private def fakeDecode(payload: Array[Byte]): (Double, Long, Long) = {
    if (payload.isEmpty) (0.0, 0L, 0L)
    else {
      var sum = 0L
      var max = Long.MinValue
      payload.foreach { b =>
        val v = b.toLong & 0xffL
        sum += v
        if (v > max) max = v
      }
      // "frame sample": one frame per 64-byte block
      (sum.toDouble / payload.length, max, (payload.length + 63L) / 64L)
    }
  }

  def queries: Seq[Q] = Seq(
    Q(
      "mm_binary_features",
      // Binary-column round trip: text → UTF-8 payload → per-partition
      // batch feature extraction. ASCII corpus ⇒ octet stats match the
      // string-side oracle.
      (s, dir) => {
        import s.implicits._
        T(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            BinFeat(id, bytes.length.toLong,
              if (bytes.nonEmpty) bytes(0).toLong & 0xffL else -1L)
          })
          .toDF()
          .orderBy("doc_id")
      },
      Some(
        "SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, " +
          "CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head " +
          "FROM documents ORDER BY doc_id")
    ),
    Q(
      "mm_decode_stub",
      // Decode/feature-extract/frame-sample pipeline over binary payloads;
      // the decode itself is the deterministic stub above.
      (s, dir) => {
        import s.implicits._
        T(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            val (mean, max, frames) = fakeDecode(bytes)
            DecodedFeat(id,
              BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble,
              max, frames)
          })
          .toDF()
          .orderBy("doc_id")
      },
      None
    ),
    Q(
      "mm_resize_stub",
      // Resize over binary payloads: the STUB downsample keeps every 4th
      // byte (stride sampling — the 1-D stand-in for image decimation; a
      // real codec resize swaps only the lambda). Payloads are resized
      // map-side in partition batches and only (metadata, checksum) rows
      // flow on — the payload never shuffles. ASCII corpus ⇒ the resized
      // checksum is oracle-stateable on the string.
      (s, dir) => {
        import s.implicits._
        T(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            val resized = Array.range(0, bytes.length, 4).map(bytes(_))
            (id, bytes.length.toLong, resized.length.toLong, resized)
          })
          .toDF("doc_id", "orig_len", "new_len", "resized")
          .withColumn("resized_md5", md5(col("resized")))
          .select("doc_id", "orig_len", "new_len", "resized_md5")
          .orderBy("doc_id")
      },
      Some(
        "SELECT doc_id, " +
          "CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS orig_len, " +
          "CAST((octet_length(CAST(text AS BLOB)) + 3) // 4 AS BIGINT) " +
          "AS new_len, " +
          "md5(array_to_string(list_transform(" +
          "range(1, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) + 1, 4), " +
          "i -> substr(text, CAST(i AS INT), 1)), '')) AS resized_md5 " +
          "FROM documents ORDER BY doc_id")
    ),
    Q(
      "mm_frame_sample",
      // Frame sampling WITHOUT decoding: the payload is treated as fixed
      // 64-byte frames and every 4th frame is sampled — offset arithmetic
      // + substring only, the pattern that lets a video pipeline pull
      // keyframes out of a 100 TB column without ever inflating it.
      // ASCII corpus ⇒ the byte-level oracle can be stated on the string.
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .withColumn("nb", length(col("payload")).cast("long"))
          .withColumn("fidx", explode(expr(
            "filter(sequence(0L, (nb - 1) DIV 64), i -> i % 4 = 0)")))
          .select(
            col("doc_id"), col("fidx"),
            least(lit(64L), col("nb") - col("fidx") * 64)
              .as("frame_len"),
            expr("CAST(ascii(decode(substring(payload, " +
              "CAST(fidx * 64 + 1 AS INT), 1), 'UTF-8')) AS BIGINT)")
              .as("frame_head"))
          .orderBy("doc_id", "fidx"),
      Some(
        "WITH f AS (SELECT doc_id, text, " +
          "CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nb, " +
          "unnest(list_filter(range(0, " +
          "CAST(octet_length(CAST(text AS BLOB)) - 1 AS BIGINT) // 64 + 1), " +
          "i -> i % 4 = 0)) AS fidx FROM documents) " +
          "SELECT doc_id, fidx, least(64, nb - fidx * 64) AS frame_len, " +
          "CAST(ascii(substr(text, CAST(fidx * 64 + 1 AS INT), 1)) AS BIGINT) " +
          "AS frame_head FROM f ORDER BY doc_id, fidx")
    )
  )
}
