package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Round-7 wave 34: cryptographic digests, column encryption, and the
  * CSV sink.
  *
  *  - `fn_hash_digests` pins the content-addressing digests every data
  *    platform keys on (md5 + SHA-256, cross-checked against DuckDB's
  *    implementations; SHA-1/CRC32/xxhash64 are Spark-only and pinned by
  *    test vectors in Wave34Spec). Codegen'd scalar work — embarrassing
  *    parallel at any scale.
  *  - `fn_aes_roundtrip` is column-level encryption at rest:
  *    `aes_encrypt` (GCM, random IV — ciphertexts differ per run) then
  *    `aes_decrypt` recovers the exact plaintext, so the op's OUTPUT is
  *    deterministic and the oracle is the plain aggregate. Pins that
  *    crypto stays inside the JVM row pipeline (no shuffle added).
  *  - `sink_csv_roundtrip` completes the sink matrix (parquet/orc/
  *    bucketed/partitioned/zorder + now csv): header + explicit-schema
  *    read-back so types survive, proven by aggregate equality.
  */
object Wave34Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "fn_hash_digests",
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"),
            md5(col("text").cast("binary")).as("d_md5"),
            sha2(col("text").cast("binary"), 256).as("d_sha256"),
            substring(md5(concat_ws("|", col("lang"), col("source"))),
              1, 8).as("part_key"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, md5(text) AS d_md5, sha256(text) AS d_sha256, " +
          "substring(md5(lang || '|' || source), 1, 8) AS part_key " +
          "FROM documents ORDER BY doc_id")
    ),
    Q(
      "fn_aes_roundtrip",
      (s, dir) => {
        val key = lit("0123456789abcdef") // 128-bit demo key
        T(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal"),
            expr("aes_encrypt(CAST(c_name AS BINARY), " +
              "'0123456789abcdef')").as("enc"))
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal"),
            expr("CAST(aes_decrypt(enc, '0123456789abcdef') AS STRING)")
              .as("c_name"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            // decrypted names survive byte-exactly: their total length
            // and min/max agree with the plaintext oracle
            sum(length(col("c_name")).cast("long")).as("name_chars"),
            min("c_name").as("first_name"),
            max("c_name").as("last_name"),
            dsum(col("c_acctbal"), 2).as("balance"))
          .orderBy("c_mktsegment")
      },
      Some(
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(length(c_name)) AS BIGINT) AS name_chars, " +
          "min(c_name) AS first_name, max(c_name) AS last_name, " +
          dsumSql("c_acctbal", 2) + " AS balance " +
          "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment")
    ),
    Q(
      "sink_csv_roundtrip",
      (s, dir) => {
        val tmp = graft.Tmp.dir("graft_csv_sink")
        val src = T(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice")
        src.write.mode("overwrite").option("header", "true").csv(tmp)
        s.read.option("header", "true").schema(src.schema).csv(tmp)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"),
            dsum(col("l_quantity"), 2).as("qty"),
            dsum(col("l_extendedprice"), 2).as("price"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(
        "SELECT l_returnflag, l_linestatus, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("l_quantity", 2) + " AS qty, " +
          dsumSql("l_extendedprice", 2) + " AS price FROM lineitem " +
          "GROUP BY l_returnflag, l_linestatus " +
          "ORDER BY l_returnflag, l_linestatus")
    )
  )
}
