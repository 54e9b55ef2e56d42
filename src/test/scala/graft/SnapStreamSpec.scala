package graft

import graft.sources.SnapTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The snapstream source: version-offset tailing of a SnapTable commit
  * log — snapshot-consistent first batch, incremental exactly-once
  * resumption from the checkpoint, and the rewrite guard.
  */
class SnapStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def df(ks: Range, tag: String) =
    ks.map(k => (k.toLong, tag)).toDF("k", "v")

  /** Drain the table into a parquet sink with AvailableNow; reusing
    * `sink`/`ckpt` resumes from the checkpoint.
    */
  private def drain(root: String, sink: String, ckpt: String,
      ignoreChanges: Boolean = false): Unit =
    StreamRun.withStateParts(spark) {
      val reader = spark.readStream.format("snapstream")
      val q = (if (ignoreChanges) reader.option("ignoreChanges", "true")
        else reader).load(root)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

  private def sunk(sink: String): Seq[(Long, String)] =
    spark.read.parquet(sink).as[(Long, String)].collect().toSeq.sorted

  test("first batch is the full snapshot; later appends resume " +
      "incrementally and exactly once from the checkpoint") {
    val root = Tmp.dir("snapstream_t1")
    val sink = Tmp.dir("snapstream_t1_sink")
    val ckpt = Tmp.dir("snapstream_t1_ckpt")
    SnapTable.create(spark, root, df(0 until 10, "v1"), "k")
    SnapTable.append(spark, root, df(10 until 20, "v2"))
    drain(root, sink, ckpt)
    assert(sunk(sink).map(_._1) == (0L until 20L))

    // two more commits, then resume: ONLY the new rows arrive
    SnapTable.append(spark, root, df(20 until 25, "v3"))
    SnapTable.append(spark, root, df(25 until 30, "v4"))
    drain(root, sink, ckpt)
    assert(sunk(sink).map(_._1) == (0L until 30L), "lost or duplicated rows")

    // no new commits: resuming adds nothing
    drain(root, sink, ckpt)
    assert(sunk(sink).map(_._1) == (0L until 30L))
  }

  test("startingVersion=2 streams changes only, no initial snapshot") {
    val root = Tmp.dir("snapstream_t2")
    SnapTable.create(spark, root, df(0 until 10, "v1"), "k")
    SnapTable.append(spark, root, df(10 until 15, "v2"))
    val name = s"snapstream_sv_${System.nanoTime()}"
    StreamRun.withStateParts(spark) {
      val q = spark.readStream.format("snapstream")
        .option("startingVersion", "2").load(root)
        .writeStream.format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(spark.table(name).as[(Long, String)].collect().toSeq.sorted
      == (10L until 15L).map((_, "v2")))
  }

  test("a rewriting commit fails the tail unless ignoreChanges is set") {
    val root = Tmp.dir("snapstream_t3")
    val sink = Tmp.dir("snapstream_t3_sink")
    val ckpt = Tmp.dir("snapstream_t3_ckpt")
    SnapTable.create(spark, root, df(0 until 10, "v1"), "k")
    drain(root, sink, ckpt)
    // delete rewrites the files containing k < 3
    SnapTable.deleteWhere(spark, root, col("k") < 3)
    val e = intercept[StreamingQueryException] {
      drain(root, sink, ckpt)
    }
    assert(e.getCause.getMessage.contains("rewritten, not appended"))
    // with ignoreChanges the rewritten file's SURVIVING rows re-emit
    drain(root, sink, ckpt, ignoreChanges = true)
    val rows = sunk(sink).map(_._1)
    assert(rows.toSet == (0L until 10L).toSet) // nothing lost
    assert(rows.size > 10, "rewritten files re-emit (at-least-once)")
  }

  test("readChangeFeed maintains a view through deletes: signed deltas " +
      "net to the live table") {
    val root = Tmp.dir("snapstream_cdc")
    val sink = Tmp.dir("snapstream_cdc_sink")
    val ckpt = Tmp.dir("snapstream_cdc_ckpt")
    def drainCdc(): Unit = StreamRun.withStateParts(spark) {
      val q = spark.readStream.format("snapstream")
        .option("readChangeFeed", "true").load(root)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    SnapTable.create(spark, root, df(0 until 10, "v1"), "k")
    drainCdc() // initial load: all +1
    SnapTable.append(spark, root, df(10 until 20, "v2"))
    drainCdc() // incremental +1s
    SnapTable.deleteWhere(spark, root, col("k") < 5)
    drainCdc() // removed file -1s, rewritten survivors +1
    val feed = spark.read.parquet(sink).as[(Long, String, Int)].collect()
    assert(feed.exists(_._3 == -1), "delete emitted no negative deltas")
    // the NET of the signed feed is exactly the live table
    val net = feed.groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(_._3).sum).filter(_._2 != 0).keys
      .map(_._1).toSeq.sorted
    assert(net == (5L until 20L))
  }
}
