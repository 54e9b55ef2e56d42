package graft

import graft.ops.Wave62Ops
import graft.ops.Wave62Ops.VecStreamIndex
import graft.sources.SnapTxn
import graft.vec.IvfRouting
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the vector streaming-ACID ingest (`stream_semdedup_index` /
  * Wave62Ops.VecStreamIndex): per-batch matches equal the shared probe
  * library at the same boundary, detection is strictly cross-commit, a
  * replayed micro-batch id is a no-op, all three table pins move in
  * lockstep, and a later batch probes the union of everything absorbed
  * before it — durability in the tables, no stream state.
  */
class VecStreamIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // two well-separated coarse cells on the integer grid
  private val cents = Seq(
    (0L, Seq(1000000L, 0L, 0L)),
    (1L, Seq(0L, 1000000L, 0L))).toDF("cid", "cg")

  private val route: DataFrame => DataFrame =
    gr => IvfRouting.assignCoarse(gr, cents)
      .withColumn("scell", lit(1L))
      .select(col("vec_id"), col("cell"), col("scell"), col("g"))

  // wave 0: 10 near cell 0, 12 near cell 1; wave 1: 21 is a near-dup
  // of 10 (same direction, scaled), 23 is orthogonal-ish in cell 1
  private val b0 = Seq(
    (10L, Seq(1000000L, 10000L, 0L)),
    (12L, Seq(0L, 900000L, 430000L)))
  private val b1 = Seq(
    (21L, Seq(2000000L, 22000L, 0L)),
    (23L, Seq(10000L, 0L, 990000L)))

  private def df(rows: Seq[(Long, Seq[Long])]) =
    rows.toDF("vec_id", "g")

  private def freshTx(): String = {
    val txroot = Tmp.dir("vecstreamindex_spec")
    VecStreamIndex.setup(spark, txroot, df(b0).limit(0), route)
    txroot
  }

  test("wave 0 probes the empty index; wave 1 finds exactly the planted " +
      "cross-commit near-dup — equal to the shared probe library") {
    val txroot = freshTx()
    assert(VecStreamIndex.ingest(spark, txroot, df(b0), 0L, route) === 0L)
    assert(VecStreamIndex.ingest(spark, txroot, df(b1), 1L, route) === 1L)
    val got = SnapTxn.read(spark, txroot, "matches")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = VecStreamIndex.probeHits(route(df(b1)), route(df(b0)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got === Set((10L, 21L)))
    // 23 landed in cell 1 but its cosine vs 12 is below threshold —
    // routing alone must not flag it... unless the fixture drifted
    val m23 = SnapTxn.read(spark, txroot, "matches")
      .filter($"vec_a" === 12L || $"vec_b" === 23L).count()
    assert(m23 === 0L)
  }

  test("within-wave pairs are NOT detected: the contract is cross-commit " +
      "(same as the batch incremental ops)") {
    val txroot = freshTx()
    // 31 duplicates 10 WITHIN the same wave
    val wave = b0 :+ (31L, Seq(1000000L, 10000L, 0L))
    VecStreamIndex.ingest(spark, txroot, df(wave), 0L, route)
    assert(SnapTxn.read(spark, txroot, "matches").count() === 0L)
    // but the NEXT wave sees both copies
    assert(VecStreamIndex.ingest(spark, txroot, df(b1), 1L, route) === 2L)
  }

  test("replayed micro-batch id is a no-op; pins move in lockstep") {
    val txroot = freshTx()
    VecStreamIndex.ingest(spark, txroot, df(b0), 0L, route)
    VecStreamIndex.ingest(spark, txroot, df(b1), 1L, route)
    val head = SnapTxn.latestTx(txroot)
    assert(VecStreamIndex.ingest(spark, txroot, df(b1), 1L, route) === -1L)
    assert(SnapTxn.latestTx(txroot) === head)
    SnapTxn.txVersions(txroot).foreach { v =>
      val pins = SnapTxn.load(txroot, v).pins
      assert(pins.values.toSet.size === 1,
        s"tx v$v pins moved out of lockstep: $pins")
    }
    assert(head === 3)
  }

  test("a later batch probes the union: a dup of a wave-1 vector (a " +
      "direction absent from wave 0) is found without any re-scan") {
    val txroot = freshTx()
    VecStreamIndex.ingest(spark, txroot, df(b0), 0L, route)
    VecStreamIndex.ingest(spark, txroot, df(b1), 1L, route)
    // 42 duplicates 23 (wave 1's direction, absent from wave 0)
    val b2 = Seq((42L, Seq(10000L, 0L, 990000L)))
    val n = VecStreamIndex.ingest(spark, txroot, df(b2), 2L, route)
    val m42 = SnapTxn.read(spark, txroot, "matches")
      .filter($"vec_b" === 42L)
      .collect().map(_.getLong(0)).toSet
    assert(m42.contains(23L))
    assert(n >= 1L)
  }

  test("the landing-table transport (stream_cdc_index) produces the " +
      "same result as the file transport — commit feed ≅ file waves") {
    def run(name: String) = Wave62Ops.queries.find(_.name == name)
      .get.fn(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val cdc = run("stream_cdc_index")
    assert(cdc === run("stream_semdedup_index"))
    assert(cdc.nonEmpty)
  }

  test("the live op is oracle-shaped on the fixture: per-cell index " +
      "occupancy covers every non-zero-norm vector") {
    val out = Wave62Ops.queries.find(_.name == "stream_semdedup_index")
      .get.fn(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    val totalVecs = out.map(_.getLong(1)).sum
    val expected = spark.read
      .parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select(col("vec_id"),
        expr(graft.vec.VecAlgs.GridExpr).as("g"))
      .filter(expr(
        "aggregate(g, CAST(0 AS BIGINT), (acc, x) -> acc + x * x) > 0"))
      .count()
    assert(totalVecs === expected)
  }
}
