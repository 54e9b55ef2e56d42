package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-34 semantics: digest test vectors, encryption properties, CSV
  * type fidelity.
  */
class Wave34Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("fn_hash_digests: Spark-only digests match published test " +
      "vectors (sha1/crc32/xxhash64 have no DuckDB twin)") {
    val r = spark.sql(
      "SELECT sha1('abc') AS s1, sha2('abc', 256) AS s2, " +
        "crc32(CAST('123456789' AS BINARY)) AS c, md5('abc') AS m, " +
        "xxhash64('abc') AS x1, xxhash64('abc') AS x2").collect().head
    assert(r.getString(0) == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(r.getString(1) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(r.getLong(2) == 0xCBF43926L, "CRC-32 check value")
    assert(r.getString(3) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getLong(4) == r.getLong(5), "xxhash64 deterministic")
    // and the op itself: digests are unique per distinct text
    val got = SparkEntry.queries("fn_hash_digests")(spark, TestSpark.Sf)
      .collect()
    val texts = T(spark, TestSpark.Sf, "documents")
      .select("text").distinct().count()
    assert(got.map(_.getString(1)).distinct.length.toLong == texts,
      "md5 collision-free on this corpus")
  }

  test("fn_aes_roundtrip: GCM ciphertexts are IV-randomized yet decrypt " +
      "byte-exactly") {
    val two = spark.sql(
      "SELECT aes_encrypt(CAST('same plaintext' AS BINARY), " +
        "'0123456789abcdef') AS a, " +
        "aes_encrypt(CAST('same plaintext' AS BINARY), " +
        "'0123456789abcdef') AS b").collect().head
    assert(!java.util.Arrays.equals(two.getAs[Array[Byte]](0),
      two.getAs[Array[Byte]](1)),
      "GCM must randomize the IV (no deterministic ciphertext leak)")
    val got = SparkEntry.queries("fn_aes_roundtrip")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = T(spark, TestSpark.Sf, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(length(col("c_name")).cast("long")).as("chars"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("sink_csv_roundtrip: schema'd read-back preserves doubles to the " +
      "cent grid") {
    val got = SparkEntry.queries("sink_csv_roundtrip")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val want = T(spark, TestSpark.Sf, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("l_quantity") * 100).cast("long")) / 100)
          .as("qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100)
          .as("price"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }
}
