package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{SnapCatalog, SnapTable}

/** The `.changes` companion table: batch and streaming signed change
  * feed through the native DSv2 path.
  */
class SnapChangesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val base: String = {
    val b = Tmp.dir("changes_spec")
    spark.conf.set("spark.sql.catalog.sct", classOf[SnapCatalog].getName)
    spark.conf.set("spark.sql.catalog.sct.root", b)
    b
  }

  test("batch: signed changelog reconstructs every transition and nets " +
      "to the current table") {
    val root = s"$base/db/cb"
    SnapTable.create(spark, root,
      spark.range(10).selectExpr("id AS k", "id AS v"), "k")      // v1
    SnapTable.append(spark, root,
      spark.range(10, 15).selectExpr("id AS k", "id AS v"))       // v2
    SnapTable.deleteWhere(spark, root, col("k") < 3)              // v3
    val changes = spark.read.table("sct.db.cb.changes")
    assert(changes.columns.takeRight(2).toSeq ==
      Seq("_sign", "_version"))
    // net effect equals the live table
    val net = changes.groupBy("k")
      .agg(sum(col("_sign")).as("s"), max("v").as("v"))
      .filter(col("s") > 0)
    assert(net.select("k").as[Long].collect().sorted.toSeq ==
      (3L until 15L))
    // per-version legs: v1 all +1, v2 five +1, v3 is a CoW rewrite of
    // the file(s) holding k<3 — adds survivors, removes originals
    val byVer = changes.groupBy("_version", "_sign").count()
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(byVer((1L, 1)) == 10)
    assert(byVer((2L, 1)) == 5)
    assert(byVer.get((3L, -1)).exists(_ >= 3), s"got $byVer")
    assert(byVer.getOrElse((3L, -1), 0L) -
      byVer.getOrElse((3L, 1), 0L) == 3, "v3 nets to -3 rows")
    // startingVersion narrows the window to the diff feed
    val fromV3 = spark.read.option("startingVersion", "3")
      .table("sct.db.cb.changes")
    assert(fromV3.select("_version").distinct().as[Long].collect()
      .toSeq == Seq(3L))
  }

  test("streaming: initial +1 snapshot, then per-commit signed diffs " +
      "across runs of one checkpoint") {
    val root = s"$base/db/cs"
    val sink = Tmp.dir("changes_sink")
    val ckpt = Tmp.dir("changes_ckpt")
    SnapTable.create(spark, root,
      spark.range(5).selectExpr("id AS k", "id * 2 AS v"), "k")
    def drain(): Unit = StreamRun.withStateParts(spark) {
      val q = spark.readStream.table("sct.db.cs.changes")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain() // initial load: 5 rows, all +1, version = head(=1)
    val first = spark.read.parquet(sink)
    assert(first.count() == 5 &&
      first.select("_sign").distinct().as[Int].collect().toSeq ==
        Seq(1))
    // two more commits: an append and a CoW delete
    SnapTable.append(spark, root,
      spark.range(5, 8).selectExpr("id AS k", "id * 2 AS v"))     // v2
    SnapTable.deleteWhere(spark, root, col("k") === 0)            // v3
    drain() // diff feed: +3 at v2, rewrite legs at v3
    val all = spark.read.parquet(sink)
    val net = all.groupBy("k").agg(sum("_sign").as("s"))
      .filter(col("s") > 0).select("k").as[Long].collect().sorted
    assert(net.toSeq == (1L to 7L),
      "signed stream nets to the live table")
    assert(all.filter(col("_version") === 2 && col("_sign") === 1)
      .count() == 3)
    assert(all.filter(col("_version") === 3 && col("_sign") === -1)
      .count() >= 1, "the delete's rewrite emits -1 rows")
  }

  test(".files metadata table mirrors the manifest exactly") {
    val root = s"$base/db/fm"
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "id AS v")
        .repartition(4), "k")
    SnapTable.append(spark, root,
      spark.range(100, 120).selectExpr("id AS k", "id AS v"))
    val got = spark.read.table("sct.db.fm.files").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val snap = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(got.length == snap.files.size)
    assert(got.map(_._2).sum == 120)
    got.foreach { case (path, rows, size, lo, hi) =>
      val f = snap.files.find(_.path == path).get
      assert(rows == f.rows && size > 0 && lo <= hi)
      assert(f.stats("k") == ((lo, hi)))
    }
  }

  test(".history and .refs metadata tables mirror the log and refs") {
    val root = s"$base/db/hr"
    SnapTable.create(spark, root,
      spark.range(10).selectExpr("id AS k"), "k")
    SnapTable.append(spark, root,
      spark.range(10, 15).selectExpr("id AS k"))
    SnapTable.createTag(root, "gold", 1)
    SnapTable.createBranch(spark, root, "exp")
    val hist = spark.read.table("sct.db.hr.history").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // create + append + branch fork commits; ops and row counts mirror
    assert(hist.map(_._1).toSeq == hist.map(_._1).sorted.toSeq)
    assert(hist.head == ((1L, "create", 10L)))
    assert(hist.exists(h => h._2 == "append" && h._3 == 15L))
    val refs = spark.read.table("sct.db.hr.refs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.contains(("tag", "gold", 1L)))
    assert(refs.exists(r => r._1 == "branch" && r._2 == "exp"))
    // metadata tables compose with SQL
    assert(spark.sql(
      "SELECT max(version) FROM sct.db.hr.history").head().getLong(0)
      >= 2L)
  }

  test("merge-on-read DVs: a MoR delete surfaces as -1 position-diff " +
      "rows, RESTORE past it resurrects as +1, net equals the table") {
    val root = s"$base/db/cd"
    SnapTable.create(spark, root,
      spark.range(20).selectExpr("id AS k", "id AS v"), "k")       // v1
    SnapTable.deleteWhereMoR(spark, root, col("k") < 5)            // v2: DV only
    val changes = spark.read.table("sct.db.cd.changes")
    val byVer = changes.groupBy("_version", "_sign").count()
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(byVer((1L, 1)) == 20, s"initial load, got $byVer")
    assert(byVer.get((2L, -1)).contains(5L),
      s"MoR delete = 5 position-diff -1 rows with no file diff: $byVer")
    assert(!byVer.contains((2L, 1)), "no +1 leg at a pure-DV commit")
    // the -1 rows are exactly the deleted keys, pre-image payload intact
    val del = changes.filter(col("_version") === 2)
      .select("k", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(del == (0L until 5L).map(k => (k, k)))
    // net of the feed equals the live table
    val net = changes.groupBy("k").agg(sum("_sign").as("s"))
      .filter(col("s") > 0).select("k").as[Long].collect().sorted
    assert(net.toSeq == (5L until 20L))
    // RESTORE past the MoR delete: carried files, DV set shrinks to
    // empty -> +1 resurrect leg for exactly the formerly-DV'd rows
    SnapTable.restore(spark, root, 1)                              // v3
    val afterRestore = spark.read.table("sct.db.cd.changes")
    val v3 = afterRestore.filter(col("_version") === 3)
    assert(v3.filter(col("_sign") === 1).count() == 5 &&
      v3.filter(col("_sign") === -1).count() == 0,
      "restore resurrects the 5 DV'd rows as +1")
    assert(v3.select("k").as[Long].collect().sorted.toSeq ==
      (0L until 5L))
    val net2 = afterRestore.groupBy("k").agg(sum("_sign").as("s"))
      .filter(col("s") > 0).count()
    assert(net2 == 20 && spark.read.table("sct.db.cd").count() == 20)
  }

  test("merge-on-read DVs: initial load on a DV-bearing snapshot " +
      "emits only visible rows; streaming feed carries the MoR delete") {
    val root = s"$base/db/ce"
    SnapTable.create(spark, root,
      spark.range(10).selectExpr("id AS k", "id AS v"), "k")       // v1
    SnapTable.deleteWhereMoR(spark, root, col("k") >= 8)           // v2
    // full batch feed: v1 initial load (10 rows +1), v2 MoR delete
    // (2 position-diff rows -1)
    val feed = spark.read.table("sct.db.ce.changes")
    val byVer = feed.groupBy("_version", "_sign").count()
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(byVer == Map((1L, 1) -> 10L, (2L, -1) -> 2L), s"$byVer")
    // batch startingVersion=2: the window's first version contributes
    // its VISIBLE snapshot (+1) — 8 rows, reading through the DV
    val fromV2 = spark.read.option("startingVersion", "2")
      .table("sct.db.ce.changes")
    assert(fromV2.count() == 8 &&
      fromV2.select("_sign").distinct().as[Int].collect().toSeq ==
        Seq(1))
    // streaming: a fresh checkpoint's initial load reads THROUGH the
    // DV (8 visible rows, all +1), then a later MoR delete streams -1
    val sink = Tmp.dir("changes_mor_sink")
    val ckpt = Tmp.dir("changes_mor_ckpt")
    def drain(): Unit = StreamRun.withStateParts(spark) {
      val q = spark.readStream.table("sct.db.ce.changes")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val first = spark.read.parquet(sink)
    assert(first.count() == 8 &&
      first.select("_sign").distinct().as[Int].collect().toSeq ==
        Seq(1))
    SnapTable.deleteWhereMoR(spark, root, col("k") === 0)          // v3
    drain()
    val second = spark.read.parquet(sink)
    assert(second.count() == 9)
    val minus = second.filter(col("_sign") === -1)
      .select("k", "_version").as[(Long, Long)].collect().toSeq
    assert(minus == Seq((0L, 3L)))
  }
}
