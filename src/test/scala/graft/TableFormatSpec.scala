package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.SnapTable

/** The snapshot table format's physical contracts — the parts the DuckDB
  * oracles CANNOT see because they restate only the logical table state:
  * commit atomicity under a race, copy-on-write touching only matched
  * files, manifest-level file skipping, and vacuum's live-file safety.
  */
class TableFormatSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def freshTable(): String = {
    val root = Tmp.dir("snaptab_spec")
    val o = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    SnapTable.create(spark, root,
      o.repartitionByRange(8, col("o_orderkey")), "o_orderkey")
    root
  }

  test("append creates a new version; old version is unchanged (isolation)") {
    val root = freshTable()
    val v1Count = SnapTable.read(spark, root).count()
    SnapTable.append(spark, root,
      SnapTable.read(spark, root).limit(100))
    assert(SnapTable.versions(root) == Seq(1, 2))
    assert(SnapTable.readVersion(spark, root, 1).count() == v1Count)
    assert(SnapTable.read(spark, root).count() == v1Count + 100)
  }

  test("commit race: losing writer retries onto the next version slot") {
    val root = freshTable()
    // simulate a concurrent winner: occupy the v2 slot out from under an
    // append already in flight conceptually — the append must land on v3
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_log", "v00000002.json"),
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, "_log", "v00000001.json")))
    val v = SnapTable.append(spark, root,
      SnapTable.readVersion(spark, root, 1).limit(10))
    assert(v == 3)
    assert(SnapTable.versions(root) == Seq(1, 2, 3))
    assert(SnapTable.read(spark, root).count() ==
      SnapTable.readVersion(spark, root, 1).count() + 10)
  }

  test("commit collision: rebased append keeps the winner's files") {
    val root = freshTable()
    val base = SnapTable.read(spark, root).count()
    // a loser computes its commit against v1 (files written, not yet
    // linked)...
    val stale = SnapTable.load(root, 1)
    val loserFresh = SnapTable.writeData(spark, root,
      SnapTable.readVersion(spark, root, 1).limit(10), "o_orderkey")
    // ...then a winner lands v2 before the loser reaches the link
    SnapTable.append(spark, root,
      SnapTable.readVersion(spark, root, 1).limit(20))
    // the loser's link on v2 now collides; it must rebase onto the new
    // head — re-linking its stale list would drop the winner's 20 rows
    val v = SnapTable.commitAppend(root, stale, loserFresh,
      SnapTable.readVersion(spark, root, 1).schema, txn = None)
    assert(v == 3)
    assert(SnapTable.read(spark, root).count() == base + 30,
      "the retried manifest must still contain the winner's files")
  }

  test("commit collision: same-txn race resolves to the winner's version") {
    val root = freshTable()
    val stale = SnapTable.load(root, 1)
    val inc = SnapTable.readVersion(spark, root, 1).limit(10)
    val loserFresh = SnapTable.writeData(spark, root, inc, "o_orderkey")
    // a concurrent delivery of the SAME txn wins the slot first
    val winner = SnapTable.appendOnce(spark, root, inc, "txn-race")
    val n = SnapTable.read(spark, root).count()
    // the loser must recognize its txn already landed and not re-append
    val v = SnapTable.commitAppend(root, stale, loserFresh, inc.schema,
      txn = Some("txn-race"))
    assert(v == winner)
    assert(SnapTable.versions(root).max == winner)
    assert(SnapTable.read(spark, root).count() == n)
  }

  test("commit collision: merge-style commit aborts, never drops the winner") {
    val root = freshTable()
    val stale = SnapTable.load(root, 1)
    SnapTable.append(spark, root,
      SnapTable.readVersion(spark, root, 1).limit(5))
    intercept[SnapTable.ConcurrentCommitException] {
      SnapTable.commitExclusive(root, stale, stale.files, "merge",
        stale.schemaJson)
    }
    // the aborted commit left no manifest behind
    assert(SnapTable.versions(root) == Seq(1, 2))
  }

  test("deleting every row leaves a readable empty table, not a brick") {
    val root = freshTable()
    SnapTable.deleteWhere(spark, root, lit(true))
    val empty = SnapTable.read(spark, root)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("o_orderkey", "o_totalprice"))
    // and the table keeps working: merge inserts into the empty snapshot
    SnapTable.merge(spark, root,
      SnapTable.readVersion(spark, root, 1).limit(7), "o_orderkey")
    assert(SnapTable.read(spark, root).count() == 7)
  }

  test("append that drops or retypes a column is rejected") {
    val root = freshTable()
    intercept[SnapTable.SchemaEvolutionException] {
      SnapTable.append(spark, root,
        SnapTable.read(spark, root).select("o_orderkey"))
    }
    intercept[SnapTable.SchemaEvolutionException] {
      SnapTable.append(spark, root, SnapTable.read(spark, root)
        .withColumn("o_totalprice", col("o_totalprice").cast("string")))
    }
    assert(SnapTable.versions(root) == Seq(1),
      "rejected appends must not commit")
  }

  test("partition evolution: metadata-only commit; each era prunes on its spec") {
    val root = Tmp.dir("snaptab_evo")
    val o = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    SnapTable.create(spark, root, o.filter(col("o_orderkey") % 2 === 0),
      "o_orderkey", spec = Seq("o_custkey"))
    val filesBefore = currentFiles(root)
    SnapTable.evolvePartition(spark, root, Seq("o_orderkey"))
    assert(currentFiles(root) == filesBefore,
      "spec evolution must not rewrite or drop any data file")
    SnapTable.append(spark, root, o.filter(col("o_orderkey") % 2 === 1))
    // era-1 files were clustered on o_custkey, era-2 files on o_orderkey;
    // each prunes on its own clustering via per-file manifest stats
    val (_, sC, tC) = SnapTable.readRange(spark, root, "o_custkey", 1L, 50L)
    val (_, sK, tK) = SnapTable.readRange(spark, root, "o_orderkey", 1L, 200L)
    assert(sC < tC, s"old-era files must prune on o_custkey ($sC/$tC)")
    assert(sK < tK, s"new-era files must prune on o_orderkey ($sK/$tK)")
    assert(SnapTable.read(spark, root).count() == o.count())
  }

  test("merge is copy-on-write: clustered update rewrites only hit files") {
    val root = freshTable()
    val before = SnapTable.versions(root)
    assert(before == Seq(1))
    val files1 = currentFiles(root)
    // keys clustered at the low end of the range layout → few files match
    val upd = SnapTable.read(spark, root)
      .filter(col("o_orderkey") <= 64)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    val nUpd = upd.count()
    SnapTable.merge(spark, root, upd, "o_orderkey")
    val files2 = currentFiles(root)
    val carried = files2.intersect(files1)
    assert(carried.nonEmpty,
      s"CoW must carry untouched files forward (v1=${files1.size} " +
        s"v2=${files2.size} carried=${carried.size})")
    assert(files2.diff(files1).nonEmpty)
    // logical result is the full upsert regardless of file physics
    val merged = SnapTable.read(spark, root)
    assert(merged.count() == SnapTable.readVersion(spark, root, 1).count())
    val bumped = merged.join(upd.select("o_orderkey"), "o_orderkey")
    assert(bumped.count() == nUpd)
  }

  test("readRange skips files by manifest stats and keeps exact results") {
    val root = freshTable()
    val (df, scanned, total) = SnapTable.readRange(spark, root, 1L, 200L)
    assert(total == 8)
    assert(scanned < total,
      s"range-clustered layout must prune files ($scanned/$total)")
    val expect = T(spark, TestSpark.Sf, "orders")
      .filter(col("o_orderkey").between(1, 200)).count()
    assert(df.count() == expect)
  }

  test("vacuum deletes dead files, keeps the live snapshot byte-identical") {
    val root = freshTable()
    val upd = SnapTable.read(spark, root)
      .filter(col("o_orderkey") <= 64)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    SnapTable.merge(spark, root, upd, "o_orderkey")
    val liveSum = SnapTable.read(spark, root)
      .agg(sum("o_totalprice")).collect()(0).getDouble(0)
    val removed = SnapTable.vacuum(root, retainVersions = 1)
    assert(removed > 0, "the rewritten files' originals must be deleted")
    assert(SnapTable.versions(root) == Seq(2))
    val afterSum = SnapTable.read(spark, root)
      .agg(sum("o_totalprice")).collect()(0).getDouble(0)
    assert(afterSum == liveSum)
  }

  test("changelog classifies delete/insert/update with correct images") {
    val root = freshTable()
    val base = SnapTable.readVersion(spark, root, 1)
    val upd = base.filter(col("o_orderkey") <= 32)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .withColumn("_del", col("o_orderkey") % 2 === 0)
      .unionByName(base.limit(1)
        .withColumn("o_orderkey", lit(99999999L))
        .withColumn("_del", lit(false)))
    SnapTable.merge(spark, root, upd, "o_orderkey", Some("_del"))
    val ch = SnapTable.changes(spark, root, 1, 2, "o_orderkey").cache()
    val byAction = ch.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val odd = base.filter(col("o_orderkey") <= 32 &&
      col("o_orderkey") % 2 =!= 0).count()
    val even = base.filter(col("o_orderkey") <= 32 &&
      col("o_orderkey") % 2 === 0).count()
    assert(byAction.get("insert").contains(1L))
    assert(byAction.get("delete").contains(even))
    assert(byAction.get("update").contains(odd))
    // update rows carry the POST image
    val post = ch.filter(col("action") === "update")
      .join(base.withColumnRenamed("o_totalprice", "pre_price"),
        "o_orderkey")
    assert(post.filter(col("o_totalprice") =!= col("pre_price") + 1.0)
      .count() == 0)
    ch.unpersist()
  }

  test("schema evolution: snapshot schema governs reads; time travel keeps v1") {
    val root = freshTable()
    val extra = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey") + 10000000L as "o_orderkey",
        col("o_totalprice"), col("o_orderpriority"))
      .limit(50)
    SnapTable.append(spark, root, extra)
    val latest = SnapTable.read(spark, root)
    assert(latest.columns.toSeq ==
      Seq("o_orderkey", "o_totalprice", "o_orderpriority"))
    // pre-evolution rows surface the added column as null, new rows as set
    assert(latest.filter(col("o_orderpriority").isNull).count() ==
      SnapTable.readVersion(spark, root, 1).count())
    assert(latest.filter(col("o_orderpriority").isNotNull).count() == 50)
    // the old snapshot still reads with its own (2-column) schema
    assert(SnapTable.readVersion(spark, root, 1).columns.toSeq ==
      Seq("o_orderkey", "o_totalprice"))
  }

  test("stream commits: one snapshot per micro-batch, no partial reads") {
    val src = Tmp.dir("snaptab_stream_src")
    val root = Tmp.dir("snaptab_stream_tab")
    val ev = T(spark, TestSpark.Sf, "events")
      .select(col("event_id"), col("event_type"))
    ev.repartition(4).write.mode("append").parquet(src)
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream
      .option("checkpointLocation", Tmp.dir("snaptab_stream_ck"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (java.nio.file.Files.exists(
            java.nio.file.Paths.get(root, "_log")))
          SnapTable.append(spark, root, b)
        else SnapTable.create(spark, root, b, "event_id")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(SnapTable.versions(root).size == 4,
      "each micro-batch must land as exactly one commit")
    assert(SnapTable.read(spark, root).count() == ev.count())
    // every intermediate snapshot is a readable consistent prefix
    val sizes = SnapTable.versions(root).map(v =>
      SnapTable.readVersion(spark, root, v).count())
    assert(sizes == sizes.sorted && sizes.last == ev.count())
  }

  test("deleteWhere: physical erasure after vacuum, CoW on touched files") {
    val root = freshTable()
    val before = SnapTable.read(spark, root).count()
    val victims = SnapTable.read(spark, root)
      .filter(col("o_orderkey") % 5 === 0).count()
    SnapTable.deleteWhere(spark, root, col("o_orderkey") % 5 === 0)
    val after = SnapTable.read(spark, root)
    assert(after.count() == before - victims)
    assert(after.filter(col("o_orderkey") % 5 === 0).count() == 0)
    // pre-delete snapshot still has them — until vacuum drops it
    assert(SnapTable.readVersion(spark, root, 1)
      .filter(col("o_orderkey") % 5 === 0).count() == victims)
    val removed = SnapTable.vacuum(root, retainVersions = 1)
    assert(removed > 0)
    assert(SnapTable.versions(root) == Seq(2))
    // no remaining data file on disk contains a victim row
    assert(SnapTable.read(spark, root)
      .filter(col("o_orderkey") % 5 === 0).count() == 0)
  }

  test("appendOnce: redelivered txn is a no-op; new txn commits") {
    val root = freshTable()
    val inc = SnapTable.read(spark, root).limit(25)
    val v2 = SnapTable.appendOnce(spark, root, inc, "job-42")
    val n2 = SnapTable.read(spark, root).count()
    // redelivery: same txn id, no new version, no new rows
    assert(SnapTable.appendOnce(spark, root, inc, "job-42") == v2)
    assert(SnapTable.versions(root).max == v2)
    assert(SnapTable.read(spark, root).count() == n2)
    // a different txn id is a genuine new commit
    assert(SnapTable.appendOnce(spark, root, inc, "job-43") == v2 + 1)
    assert(SnapTable.read(spark, root).count() == n2 + 25)
  }

  test("appendOnce: a duplicate that landed BEFORE the head load is " +
      "seen by the pre-link txn check (no double append)") {
    val root = freshTable()
    val inc = SnapTable.read(spark, root).limit(25)
    val v2 = SnapTable.appendOnce(spark, root, inc, "job-9") // the winner
    val n = SnapTable.read(spark, root).count()
    // simulate the TOCTOU loser: its fast-path check ran before the
    // winner landed (it saw nothing), then it loaded the head AFTER —
    // i.e. commitAppend is called with the winner already in the parent
    val parent = SnapTable.load(root, SnapTable.latestVersion(root))
    val fresh = SnapTable.writeData(spark, root, inc, "o_orderkey")
    val got = SnapTable.commitAppend(root, parent, fresh,
      inc.schema, txn = Some("job-9"))
    assert(got == v2, "loser must resolve to the winner's version")
    assert(SnapTable.versions(root).max == v2, "no extra version linked")
    assert(SnapTable.read(spark, root).count() == n, "rows doubled")
  }

  test("restore returns the whole snapshot identity, including the spec") {
    import spark.implicits._
    val root = Tmp.dir("snaptab_spec")
    val df = (0L until 100L).map(k => (k, k % 7)).toDF("k", "w")
    SnapTable.create(spark, root, df, "k", spec = Seq("k"))
    SnapTable.evolvePartition(spark, root, Seq("w"))
    SnapTable.append(spark, root, df)
    SnapTable.restore(spark, root, 1)
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.spec == Seq("k"),
      "restored manifest must declare the restored era's clustering")
    assert(SnapTable.read(spark, root).count() == 100)
  }

  test("shallow clone copies no data files; divergence is isolated") {
    val root = freshTable()
    val dst = Tmp.dir("snaptab_clone")
    SnapTable.clone(spark, root, dst)
    // zero-copy: the clone has NO data directory of its own yet
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dst, "data")))
    val srcRows = SnapTable.read(spark, root).count()
    assert(SnapTable.read(spark, dst).count() == srcRows)
    // clone diverges; source is untouched (and vice versa)
    SnapTable.append(spark, dst, SnapTable.read(spark, root).limit(50))
    SnapTable.append(spark, root, SnapTable.read(spark, root).limit(10))
    assert(SnapTable.read(spark, dst).count() == srcRows + 50)
    assert(SnapTable.read(spark, root).count() == srcRows + 10)
    // the clone's own commits live under its own data dir
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dst, "data")))
  }

  test("merge-on-read delete: no files rewritten, reads subtract the DV, " +
      "compact materializes, vacuum honors DV liveness") {
    import org.apache.spark.sql.functions.col
    val root = freshTable()
    val before = SnapTable.load(root, SnapTable.latestVersion(root))
    val total = SnapTable.read(spark, root).count()
    val nDel = SnapTable.read(spark, root)
      .filter(col("o_totalprice") > 300000).count()
    SnapTable.deleteWhereMoR(spark, root, col("o_totalprice") > 300000)
    val after = SnapTable.load(root, SnapTable.latestVersion(root))
    // the data files are untouched; only a DV was added
    assert(after.files == before.files, "MoR delete must not rewrite")
    assert(after.dvs.size == 1)
    assert(SnapTable.read(spark, root).count() == total - nDel)
    // a second MoR delete stacks; already-deleted rows are not re-marked
    SnapTable.deleteWhereMoR(spark, root, col("o_totalprice") > 250000)
    val nDel2 = total - SnapTable.read(spark, root).count()
    assert(SnapTable.read(spark, root)
      .filter(col("o_totalprice") > 250000).count() == 0)
    // time travel before the deletes still sees every row
    assert(SnapTable.readVersion(spark, root, 1).count() == total)
    // CoW delete is DV-AWARE now (no compact-first refusal): a no-match
    // predicate routes through the DV-aware rewrite and leaves the
    // content identical (full semantics pinned in the dedicated spec)
    SnapTable.deleteWhere(spark, root, col("o_totalprice") < -1)
    assert(SnapTable.read(spark, root).count() == total - nDel2)
    // classified CDC reads THROUGH the vectors: rows deleted by the
    // stacked MoR commits classify as deletes although no file changed
    val cdc = SnapTable.changes(spark, root, 1,
      SnapTable.latestVersion(root), "o_orderkey")
    assert(cdc.filter(col("action") =!= "delete").count() == 0)
    assert(cdc.count() == nDel2)
    assert(cdc.filter(col("o_totalprice") <= 250000).count() == 0)
    // the SIGNED feed is DV-aware: both stacked MoR deletes surface as
    // -1 position rows (no file changed), netting to the live table
    val delta = SnapTable.changesDelta(spark, root, 1,
      SnapTable.latestVersion(root))
    assert(delta.filter(col("_sign") =!= -1).count() == 0)
    assert(delta.count() == nDel2)
    assert(delta.filter(col("o_totalprice") <= 250000).count() == 0)
    // compact materializes: DVs cleared, content identical
    SnapTable.compact(spark, root, targetFiles = 2)
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.dvs.isEmpty)
    assert(SnapTable.read(spark, root).count() == total - nDel2)
    // vacuum to the head: the now-unreferenced DV dirs are reclaimed
    assert(SnapTable.vacuum(root, retainVersions = 1) > 0)
    assert(SnapTable.read(spark, root).count() == total - nDel2)
    assert(!graft.sources.SnapTable.versions(root).exists(_ < 4))
  }

  test("CHECK constraints: validated on add, enforced per batch, " +
      "survive commits, droppable") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = Tmp.dir("snaptab_checks")
    SnapTable.create(spark, root,
      (0L until 100L).map(k => (k, k * 2)).toDF("k", "v"), "k")
    // adding a check the EXISTING data violates is rejected
    intercept[SnapTable.ConstraintViolationException] {
      SnapTable.addCheck(spark, root, "v_small", "v < 100")
    }
    SnapTable.addCheck(spark, root, "v_even", "v % 2 = 0")
    SnapTable.addCheck(spark, root, "k_nonneg", "k >= 0")
    // a violating batch fails BEFORE committing; table is unchanged
    val head = SnapTable.latestVersion(root)
    intercept[SnapTable.ConstraintViolationException] {
      SnapTable.append(spark, root, Seq((200L, 7L)).toDF("k", "v"))
    }
    assert(SnapTable.latestVersion(root) == head)
    assert(SnapTable.read(spark, root).count() == 100)
    // a conforming batch passes; the checks survive the commit
    SnapTable.append(spark, root,
      (100L until 110L).map(k => (k, k * 4)).toDF("k", "v"))
    assert(SnapTable.read(spark, root).count() == 110)
    assert(SnapTable.load(root, SnapTable.latestVersion(root))
      .checks.keySet == Set("v_even", "k_nonneg"))
    // dropCheck re-opens the gate
    SnapTable.dropCheck(root, "v_even")
    SnapTable.append(spark, root, Seq((300L, 7L)).toDF("k", "v"))
    assert(SnapTable.read(spark, root).count() == 111)
  }

  test("compact shrinks the file count and preserves content + pruning") {
    val root = Tmp.dir("snaptab_spec")
    val o = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    SnapTable.create(spark, root, o.filter(col("o_orderkey") % 4 === 0)
      .repartition(6), "o_orderkey")
    (1 to 3).foreach(i => SnapTable.append(spark, root,
      o.filter(col("o_orderkey") % 4 === i).repartition(6)))
    val filesBefore = currentFiles(root).size
    // cents-integer sum: associative, so immune to the partition-order
    // change the compaction rewrite causes
    def cents() = SnapTable.read(spark, root)
      .agg(sum(round(col("o_totalprice") * 100).cast("long")))
      .collect()(0).getLong(0)
    val before = (SnapTable.read(spark, root).count(), cents())
    SnapTable.compact(spark, root, targetFiles = 4)
    assert(currentFiles(root).size == 4)
    assert(currentFiles(root).size < filesBefore)
    assert((SnapTable.read(spark, root).count(), cents()) == before)
    // range clustering restored: a narrow key range prunes again
    val (_, scanned, total) = SnapTable.readRange(spark, root, 1L, 200L)
    assert(total == 4 && scanned < total)
  }

  test("zorder compact prunes on BOTH interleaved dimensions") {
    val root = Tmp.dir("snaptab_spec")
    val o = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("o_day"), col("o_totalprice"))
    SnapTable.create(spark, root, o.repartition(8), "o_orderkey")
    def bit(c: org.apache.spark.sql.Column, i: Int) =
      shiftrightunsigned(c, i).bitwiseAND(lit(1L))
    val r = o.agg(min("o_custkey"), max("o_custkey"),
      min("o_day"), max("o_day")).collect()(0)
    def w(lo: Long, hi: Long) = math.max(1L, (hi - lo + 255) / 256)
    val b1 = least(expr(
      s"(o_custkey - ${r.getLong(0)}) div ${w(r.getLong(0), r.getLong(1))}"),
      lit(255L))
    val b2 = least(expr(
      s"(o_day - ${r.getLong(2)}) div ${w(r.getLong(2), r.getLong(3))}"),
      lit(255L))
    val morton = (0 until 8).map { i =>
      shiftleft(bit(b1, i), 2 * i)
        .bitwiseOR(shiftleft(bit(b2, i), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
    SnapTable.compact(spark, root, targetFiles = 16,
      clusterBy = Some(morton))
    val (dfC, scannedC, totalC) =
      SnapTable.readRange(spark, root, "o_custkey", 1L, 20L)
    val (dfD, scannedD, totalD) =
      SnapTable.readRange(spark, root, "o_day", 1500L, 1700L)
    assert(totalC == 16 && totalD == 16)
    assert(scannedC < totalC, s"custkey axis must prune ($scannedC/16)")
    assert(scannedD < totalD, s"day axis must prune ($scannedD/16)")
    // exactness unaffected by pruning
    assert(dfC.count() ==
      o.filter(col("o_custkey").between(1, 20)).count())
    assert(dfD.count() ==
      o.filter(col("o_day").between(1500, 1700)).count())
  }

  test("changesDelta maintains a linear aggregate incrementally") {
    val root = freshTable()
    val upd = SnapTable.read(spark, root)
      .filter(col("o_orderkey") <= 64)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .withColumn("_del", col("o_orderkey") % 3 === 0)
    SnapTable.merge(spark, root, upd, "o_orderkey", Some("_del"))
    def cents(df: org.apache.spark.sql.DataFrame) = df
      .agg(sum(round(col("o_totalprice") * 100).cast("long")),
        count(lit(1)))
      .collect()(0)
    val full = cents(SnapTable.read(spark, root))
    val base = cents(SnapTable.readVersion(spark, root, 1))
    val d = SnapTable.changesDelta(spark, root, 1, 2)
      .agg(sum(col("_sign") *
        round(col("o_totalprice") * 100).cast("long")),
        sum(col("_sign").cast("long")))
      .collect()(0)
    assert(base.getLong(0) + d.getLong(0) == full.getLong(0),
      "incremental sum must equal recompute")
    assert(base.getLong(1) + d.getLong(1) == full.getLong(1),
      "incremental count must equal recompute")
  }

  test("metadata-only commits write O(1) filesRef manifests; refs " +
      "resolve, survive vacuum, and restore reuses them") {
    val root = freshTable() // v1: inline file list
    def raw(v: Int) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_log", f"v$v%08d.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    SnapTable.renameColumn(root, "o_totalprice", "price")       // v2
    SnapTable.addCheck(spark, root, "pos", "price >= 0")        // v3
    val del = SnapTable.read(spark, root)
      .filter(col("o_orderkey") % 100 === 7).count()
    assert(del > 0)
    SnapTable.deleteWhereMoR(spark, root,
      col("o_orderkey") % 100 === 7) // v4
    Seq(2, 3, 4).foreach { v =>
      assert(raw(v).contains("\"filesRef\":") && !raw(v).contains("\"files\":"),
        s"v$v should be a metadata-only ref manifest:\n${raw(v).take(200)}")
      assert(raw(v).length < raw(1).length / 2,
        s"ref manifest v$v is not small: ${raw(v).length}")
      assert(SnapTable.load(root, v).files == SnapTable.load(root, 1).files)
    }
    // chains stay depth 1: v3/v4 ref v1 directly, not v2
    assert(SnapTable.load(root, 4).filesFrom == 1)
    // an append materializes a fresh inline list again
    SnapTable.append(spark, root, SnapTable.read(spark, root).limit(10)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)) // v5
    assert(raw(5).contains("\"files\":"))
    assert(SnapTable.load(root, 5).filesFrom == 5)
    // RESTORE to the ref-era head re-serializes as a ref, not a re-list
    SnapTable.restore(spark, root, 4) // v6
    assert(raw(6).contains("\"filesRef\":1"))
    assert(SnapTable.read(spark, root)
      .filter(col("o_orderkey") % 100 === 7).count() == 0)
    // vacuum keeps the ref CLOSURE: retaining only the head keeps v1
    // loadable because v6 refs it
    SnapTable.vacuum(root, retainVersions = 1)
    assert(SnapTable.versions(root).contains(1),
      "vacuum dropped a manifest the head's filesRef needs")
    assert(SnapTable.read(spark, root).count() ==
      SnapTable.load(root, 1).files.map(_.rows).sum - del)
  }

  test("ADD COLUMN DEFAULT back-fills pre-existing rows, keeps " +
      "post-add NULLs, materializes on rewrite, clears on compact") {
    val root = Tmp.dir("defaults_spec")
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "concat('d', id) AS txt")
        .repartitionByRange(4, col("k")), "k")
    SnapTable.addColumn(root, "status",
      org.apache.spark.sql.types.StringType, Some("'active'")) // v2
    // metadata-only: no data file touched, and a filesRef manifest
    assert(SnapTable.load(root, 2).files == SnapTable.load(root, 1).files)
    // pre-existing rows read the default instead of null
    val r = SnapTable.read(spark, root)
    assert(r.filter(col("status") === "active").count() == 100)
    // post-add rows: explicit values kept, explicit NULLs stay NULL
    SnapTable.append(spark, root,
      spark.range(100, 120).selectExpr("id AS k", "concat('d', id) AS txt",
        "CASE WHEN id % 2 = 0 THEN 'new' END AS status"))
    val r2 = SnapTable.read(spark, root)
    assert(r2.filter(col("status").isNull).count() == 10,
      "explicit post-add NULLs must stay NULL")
    assert(r2.filter(col("status") === "new").count() == 10)
    assert(r2.filter(col("status") === "active").count() == 100)
    // time travel BEFORE the add has no column; at v2 it fills
    assert(!SnapTable.readVersion(spark, root, 1).columns.contains("status"))
    assert(SnapTable.readVersion(spark, root, 2)
      .filter(col("status") === "active").count() == 100)
    // a CoW rewrite reads THROUGH the fill, so rewritten rows
    // materialize 'active' (not null)
    SnapTable.merge(spark, root,
      spark.range(0, 5).selectExpr("id AS k", "'m' AS txt",
        "CAST(NULL AS STRING) AS status")
        .withColumn("status", lit(null).cast("string")), "k")
    val merged = SnapTable.read(spark, root)
    // matched keys got explicit NULL; unmatched pre-add rows in the
    // SAME rewritten files keep their materialized default
    assert(merged.filter(col("k") < 5 && col("status").isNull)
      .count() == 5)
    assert(merged.filter(col("k") >= 5 && col("k") < 100 &&
      col("status") =!= "active").count() == 0)
    // SQL point lookups through the native scan see the fill too
    val expectActive = merged.filter(col("status") === "active").count()
    // compact materializes + CLEARS the defaults map (clone-ready)
    SnapTable.compact(spark, root, 2)
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.defaults.isEmpty, "compact must clear initial defaults")
    assert(SnapTable.read(spark, root)
      .filter(col("status") === "active").count() == expectActive)
    // a defaults-bearing snapshot CLONES without compact-first: the
    // era watermark (eraHi) carries, so clone-side writes stamp above
    // the source threshold even though the clone's VERSION space
    // restarts at 1 (fresh table with the add at src-v4 so the old
    // version-keyed eras would have collided: clone-era 2 < addedAt 4)
    val root2 = Tmp.dir("defaults_clone_src")
    SnapTable.create(spark, root2,
      spark.range(5).selectExpr("id AS k"), "k")
    SnapTable.append(spark, root2,
      spark.range(5, 8).selectExpr("id AS k"))        // v2
    SnapTable.append(spark, root2,
      spark.range(8, 10).selectExpr("id AS k"))       // v3
    SnapTable.addColumn(root2, "v",
      org.apache.spark.sql.types.LongType, Some("7")) // v4, threshold 4
    val dst2 = Tmp.dir("defaults_clone_dst")
    SnapTable.clone(spark, root2, dst2)
    assert(SnapTable.read(spark, dst2)
      .agg(sum(col("v"))).collect()(0).getLong(0) == 70,
      "carried pre-add files must keep filling in the clone")
    // clone-written rows hold EXPLICIT values: an explicit NULL stays
    // NULL (under version-keyed eras this append would stamp era 2 <
    // threshold 4 and be mis-filled)
    SnapTable.append(spark, dst2, spark.range(10, 13)
      .selectExpr("id AS k", "CAST(NULL AS BIGINT) AS v"))
    val cr = SnapTable.read(spark, dst2)
    assert(cr.filter(col("k") >= 10 && col("v").isNull).count() == 3,
      "explicit NULLs in clone-era files must stay NULL")
    assert(cr.filter(col("v") === 7).count() == 10)
    // ...and the source never observes any of it
    assert(SnapTable.read(spark, root2).count() == 10)
    // numeric default + CDC: pre-images of v1-era rows carry the fill
    assert(SnapTable.read(spark, root2)
      .agg(sum(col("v"))).collect()(0).getLong(0) == 70)
    SnapTable.deleteWhere(spark, root2, col("k") < 3)
    val ch = SnapTable.changes(spark, root2, 4, 5, "k")
    assert(ch.filter(col("action") === "delete" && col("v") === 7)
      .count() == 3, "CDC pre-images must carry the default fill")
  }

  test("convertInPlace adopts a parquet dir zero-copy: files untouched, " +
      "stats lifted from footers, full verb set from the next commit") {
    val root = Tmp.dir("convert_spec")
    spark.range(1000)
      .selectExpr("id AS k", "id * 7 AS v", "concat('s', id % 5) AS tag")
      .repartitionByRange(70, col("k")) // >64 files: the DISTRIBUTED sweep
      .write.mode("overwrite").parquet(root)
    import scala.jdk.CollectionConverters._
    def files() = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try st.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
      finally st.close()
    }
    val before = files()
    assert(before.size > 64)
    SnapTable.convertInPlace(spark, root, "k")
    assert(files() == before, "conversion touched a data file")
    val snap = SnapTable.load(root, 1)
    assert(snap.op == "convert" && snap.files.size == before.size)
    assert(snap.files.map(_.rows).sum == 1000)
    // footer-lifted stats prune ranges AND strings
    val (rr, hit, total) = SnapTable.readRange(spark, root, "v", 0L, 70L)
    assert(rr.count() == 11 && hit < total)
    // the converted table is a full citizen: merge, time travel, CDC
    SnapTable.merge(spark, root,
      spark.range(5).selectExpr("id AS k", "CAST(-1 AS BIGINT) AS v",
        "'m' AS tag"), "k")
    assert(SnapTable.read(spark, root).filter(col("v") === -1)
      .count() == 5)
    assert(SnapTable.readVersion(spark, root, 1)
      .filter(col("v") === -1).count() == 0)
    assert(SnapTable.changes(spark, root, 1, 2, "k")
      .filter(col("action") === "update").count() == 5)
    // refusals: double-convert, absent stats column
    intercept[IllegalArgumentException] {
      SnapTable.convertInPlace(spark, root, "k")
    }
    val root2 = Tmp.dir("convert_spec2")
    spark.range(10).selectExpr("id AS k")
      .write.mode("overwrite").parquet(root2)
    intercept[IllegalArgumentException] {
      SnapTable.convertInPlace(spark, root2, "nope")
    }
  }

  test("changesDelta spans a RENAME COLUMN boundary: pre-images emit " +
      "under the current logical name and the delta still nets out") {
    val root = Tmp.dir("delta_rename_spec")
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "CAST(id * 3 AS DOUBLE) AS m")
        .repartitionByRange(4, col("k")), "k")
    SnapTable.renameColumn(root, "m", "metric") // v2, metadata-only
    // a rewrite AFTER the rename: files added under the new mapping,
    // files removed that predate it — the union crosses the boundary
    SnapTable.merge(spark, root,
      spark.range(0, 10).selectExpr("id AS k",
        "CAST(-5 AS DOUBLE) AS metric"), "k") // v3
    val d = SnapTable.changesDelta(spark, root, 1, 3)
    assert(d.columns.toSeq == Seq("k", "metric", "_sign"),
      s"delta must emit the TO snapshot's logical names: ${d.columns.toSeq}")
    def agg(df: org.apache.spark.sql.DataFrame, m: String) = df
      .agg(sum((if (m == "_signed") col("_sign") * col("metric")
        else col("metric")).cast("long"))).collect()(0).getLong(0)
    val base = agg(SnapTable.readVersion(spark, root, 1)
      .withColumnRenamed("m", "metric"), "metric")
    val full = agg(SnapTable.read(spark, root), "metric")
    assert(base + agg(d, "_signed") == full,
      "delta across the rename must maintain the aggregate")
  }

  test("MoR delete writes per-file-grouped DV parts, no single-task funnel") {
    val root = freshTable() // 8 range-clustered files
    // a delete spread over EVERY file: the DV write must fan out by data
    // file, not funnel through one task
    SnapTable.deleteWhereMoR(spark, root, col("o_orderkey") % 5 === 0)
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.op == "delete-mor" && head.dvs.size == 1)
    val dvDir = java.nio.file.Paths.get(root).resolve(head.dvs.head)
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.list(dvDir)
    val parts =
      try st.iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
      finally st.close()
    assert(parts.size >= 2,
      s"a delete spanning 8 files must write >1 DV part (got ${parts.size})")
    // one data file's positions live in exactly ONE part: a reader of a
    // single file never needs more than one part's positions
    val sets = parts.map(p => spark.read.parquet(p.toString)
      .select("_dv_path").distinct().collect().map(_.getString(0)).toSet)
    for (i <- sets.indices; j <- (i + 1) until sets.size)
      assert(sets(i).intersect(sets(j)).isEmpty,
        "a data file's positions must not straddle DV parts")
  }

  test("MoR update: one O(matches) commit (DV + transformed appends), " +
      "no touched-file rewrite; oversized falls back to CoW") {
    val root = freshTable() // 8 range-clustered files of orders
    val before = SnapTable.load(root, 1)
    val expect = SnapTable.read(spark, root)
      .filter(col("o_orderkey") % 50 === 0).count()
    SnapTable.updateWhereMoR(spark, root, col("o_orderkey") % 50 === 0,
      Map("o_totalprice" -> "o_totalprice + 1000000"))
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.op == "update-mor" && head.dvs.size == 1)
    // every original file carried forward by reference — only fresh
    // appended files beyond them
    assert(before.files.toSet.subsetOf(head.files.toSet),
      "MoR update must not rewrite a touched file")
    val r = SnapTable.read(spark, root)
    assert(r.count() == before.files.map(_.rows).sum, "row count drift")
    assert(r.filter(col("o_totalprice") > 900000).count() == expect)
    // a second MoR update stacks (updates previously-updated rows)
    SnapTable.updateWhereMoR(spark, root, col("o_totalprice") > 900000,
      Map("o_totalprice" -> "o_totalprice + 1"))
    assert(SnapTable.read(spark, root)
      .filter(col("o_totalprice") > 900000).count() == expect)
    // compact materializes: DVs cleared, content identical
    val sum0 = SnapTable.read(spark, root)
      .agg(sum(round(col("o_totalprice") * 100).cast("long")))
      .collect()(0).getLong(0)
    SnapTable.compact(spark, root, 4)
    val headC = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(headC.dvs.isEmpty)
    assert(SnapTable.read(spark, root)
      .agg(sum(round(col("o_totalprice") * 100).cast("long")))
      .collect()(0).getLong(0) == sum0)
    // oversized: maxPositions=0 forces the CoW fallback — touched
    // files leave the list, content stays exact
    val preCow = SnapTable.load(root, SnapTable.latestVersion(root))
    SnapTable.updateWhereMoR(spark, root, col("o_orderkey") % 50 === 0,
      Map("o_totalprice" -> "o_totalprice - 1000001"),
      maxPositions = 0)
    val headCow = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(headCow.op == "update" && headCow.dvs.isEmpty)
    assert(!preCow.files.forall(f => headCow.files.contains(f)),
      "CoW fallback must rewrite the touched files")
    assert(SnapTable.read(spark, root)
      .filter(col("o_orderkey") % 50 === 0 &&
        col("o_totalprice") > 900000).count() == 0)
    assert(SnapTable.read(spark, root).count() ==
      before.files.map(_.rows).sum)
  }

  test("oversized MoR delete falls back to DV-aware copy-on-write") {
    val root = freshTable()
    val o = SnapTable.readVersion(spark, root, 1)
    val total = o.count()
    SnapTable.deleteWhereMoR(spark, root, col("o_orderkey") % 5 === 0)
    val headMor = SnapTable.load(root, SnapTable.latestVersion(root))
    val afterMor = SnapTable.read(spark, root).count()
    // far more matches than maxPositions: the guard must refuse to grow
    // the DV and rewrite the touched files instead
    SnapTable.deleteWhereMoR(spark, root, col("o_totalprice") > 100000,
      maxPositions = 10)
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.op == "delete", "guard must fall back to a CoW commit")
    assert(head.dvs == headMor.dvs,
      "prior DV entries stay (inert for rewritten files, live for carried)")
    assert(head.files != headMor.files, "fallback rewrites touched files")
    // DV-aware: rows the FIRST delete removed stay removed, the second
    // delete's matches are gone, and nothing else was lost
    val live = SnapTable.read(spark, root)
    assert(live.filter(col("o_orderkey") % 5 === 0).count() == 0)
    assert(live.filter(col("o_totalprice") > 100000).count() == 0)
    assert(total > afterMor, "fixture sanity: first delete matched rows")
    assert(live.count() == SnapTable.readVersion(spark, root, 1)
      .filter(!(col("o_orderkey") % 5 === 0) &&
        !(col("o_totalprice") > 100000)).count())
  }

  test("DV read degrades to a shuffled anti-join over the broadcast cap") {
    // isolated SQLConf so the threshold games don't leak to other suites
    val s = TestSpark.spark.newSession()
    val root = Tmp.dir("snaptab_spec")
    val o = T(s, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    SnapTable.create(s, root,
      o.repartitionByRange(8, col("o_orderkey")), "o_orderkey")
    val expect = o.filter(!(col("o_totalprice") > 300000)).count()
    SnapTable.deleteWhereMoR(s, root, col("o_totalprice") > 300000)
    // generous threshold: the DV side is hinted and broadcasts
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val hinted = SnapTable.read(s, root)
    assert(hinted.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"))
    assert(hinted.count() == expect)
    // 1-byte threshold: the hint must NOT be planted — the anti-join
    // shuffles instead of broadcasting an over-cap DV to every executor
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    val shuffled = SnapTable.read(s, root)
    assert(!shuffled.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"),
      "an over-threshold DV must not be broadcast")
    assert(shuffled.count() == expect)
  }

  test("shallow clone of a DV-bearing snapshot re-bases the positions") {
    val root = freshTable()
    val expectAll = SnapTable.read(spark, root).count()
    SnapTable.deleteWhereMoR(spark, root, col("o_totalprice") > 300000)
    val expect = SnapTable.read(spark, root).count()
    assert(expect < expectAll)
    val dst = Tmp.dir("snaptab_clone_dv")
    SnapTable.clone(spark, root, dst)
    // deleted rows stay deleted through the clone's foreign-file reads
    assert(SnapTable.read(spark, dst).count() == expect)
    assert(SnapTable.read(spark, dst)
      .filter(col("o_totalprice") > 300000).count() == 0)
    // and the clone's own MoR delete stacks on the re-based vector
    SnapTable.deleteWhereMoR(spark, dst, col("o_orderkey") % 7 === 0)
    assert(SnapTable.read(spark, dst).count() ==
      SnapTable.readVersion(spark, root, 1)
        .filter(!(col("o_totalprice") > 300000) &&
          !(col("o_orderkey") % 7 === 0)).count())
    // source never observes any of it
    assert(SnapTable.read(spark, root).count() == expect)
  }

  test("DELETE WHERE keeps rows where the predicate is NULL") {
    import spark.implicits._
    val root = Tmp.dir("snaptab_spec")
    val df = Seq((1L, Option(10.0)), (2L, Option.empty[Double]),
      (3L, Option(1.0))).toDF("k", "v")
    SnapTable.create(spark, root, df, "k")
    SnapTable.deleteWhere(spark, root, col("v") > 5)
    // SQL DELETE semantics: only predicate=TRUE rows go; NULL survives
    assert(SnapTable.read(spark, root).select("k").collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
    // and the MoR fallback path honors the same contract
    val root2 = Tmp.dir("snaptab_spec")
    SnapTable.create(spark, root2, df, "k")
    SnapTable.deleteWhereMoR(spark, root2, col("v") > 5, maxPositions = 0)
    assert(SnapTable.read(spark, root2).select("k").collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  private def currentFiles(root: String): Set[String] =
    SnapTable.load(root, SnapTable.latestVersion(root))
      .files.map(_.path).toSet

  test("generated columns: computed when absent, validated when provided") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val root = Tmp.dir("snaptab_gencol")
    val base = spark.range(20).selectExpr("id AS k", "id * 3 AS raw")
    SnapTable.createEmpty(root,
      StructType(base.schema.fields :+ StructField("dbl", LongType)), "k")
    SnapTable.addGenerated(spark, root, "dbl", "raw * 2")
    // manifest round-trip
    assert(SnapTable.load(root, SnapTable.latestVersion(root))
      .gen == Map("dbl" -> "raw * 2"))
    // absent → computed at write time (the files themselves carry it)
    SnapTable.append(spark, root, base.filter(col("k") < 10))
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    val onDisk = spark.read.parquet(
      head.files.map(f => s"$root/${f.path}"): _*)
    assert(onDisk.columns.contains("dbl"))
    assert(onDisk.filter(col("dbl") =!= col("raw") * 2).count() == 0)
    // provided-correct → validated, accepted
    SnapTable.append(spark, root, base.filter(col("k") >= 10)
      .withColumn("dbl", col("raw") * 2))
    assert(SnapTable.read(spark, root).count() == 20)
    // provided-WRONG → commit fails before any manifest link
    val vBefore = SnapTable.latestVersion(root)
    intercept[SnapTable.ConstraintViolationException] {
      SnapTable.append(spark, root,
        base.limit(3).withColumn("dbl", lit(0L)))
    }
    assert(SnapTable.latestVersion(root) == vBefore)
    // drop → the column becomes a plain column again (no validation)
    SnapTable.dropGenerated(root, "dbl")
    SnapTable.append(spark, root,
      spark.range(100, 103).selectExpr("id AS k", "id AS raw",
        "CAST(7 AS BIGINT) AS dbl"))
    assert(SnapTable.read(spark, root).count() == 23)
  }

  test("mergeOnce dedups a redelivered batch; distinct txns both land") {
    val root = freshTable()
    val n0 = SnapTable.read(spark, root).count()
    val upd = SnapTable.read(spark, root).limit(40)
      .withColumn("o_totalprice", col("o_totalprice") + 1)
    val v = SnapTable.mergeOnce(spark, root, upd, "o_orderkey", None,
      txnId = "batch-7")
    // redelivery: same txn, no new version, no double-application
    assert(SnapTable.mergeOnce(spark, root, upd, "o_orderkey", None,
      txnId = "batch-7") == v)
    assert(SnapTable.latestVersion(root) == v)
    assert(SnapTable.read(spark, root).count() == n0)
    // a different txn is a real merge
    val v2 = SnapTable.mergeOnce(spark, root, upd, "o_orderkey", None,
      txnId = "batch-8")
    assert(v2 == v + 1)
    assert(SnapTable.read(spark, root).count() == n0)
  }

  test("API merge and deleteWhere read through outstanding DVs: " +
      "deleted rows neither match nor resurrect") {
    val root = Tmp.dir("dv_cow_spec")
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "id AS v")
        .repartitionByRange(4, col("k")), "k")
    SnapTable.deleteWhereMoR(spark, root, col("k") < 5)
    assert(SnapTable.load(root, SnapTable.latestVersion(root))
      .dvs.nonEmpty)
    // merge keys 0..9: DV'd 0..4 must behave as ABSENT (insert), live
    // 5..9 as matches (update) — and no duplicates may appear
    SnapTable.merge(spark, root,
      spark.range(0, 10).selectExpr("id AS k", "CAST(-1 AS BIGINT) AS v"),
      "k")
    val after = SnapTable.read(spark, root)
    assert(after.count() == 100)
    assert(after.select("k").distinct().count() == 100,
      "a DV'd row resurrected as a duplicate")
    assert(after.filter(col("v") === -1).count() == 10)
    // CoW delete through the remaining DVs (their file was rewritten by
    // the merge, so the entries are inert — but the path must not care)
    SnapTable.deleteWhere(spark, root, col("k") >= 90)
    assert(SnapTable.read(spark, root).count() == 90)
    assert(SnapTable.read(spark, root)
      .agg(min(col("k"))).head().getLong(0) == 0L)
  }

  test("bloom index skips files for point lookups; appends stay " +
      "correct; vacuum and compact keep the index live") {
    val root = Tmp.dir("bloom_spec")
    // clustered on k; v is uncorrelated with the layout, so every
    // file's v-range spans the domain and range stats prune nothing
    val base = spark.range(0, 10000)
      .selectExpr("id AS k", "(id * 2654435761) % 10000 AS v")
    SnapTable.create(spark, root,
      base.repartitionByRange(8, col("k")), "k")
    SnapTable.addBloomIndex(spark, root, "v")
    val probe = 4321L
    val expect = base.filter(col("v") === probe).count()
    val (df, read, total) = SnapTable.readPoint(spark, root, "v", probe)
    assert(df.count() == expect)
    assert(expect > 0)
    assert(read < total, s"bloom pruned nothing: $read of $total")
    // appends MAINTAIN the index incrementally — rows appended after the
    // build get their own sidecar entries, so lookups stay correct AND
    // keep pruning (the appended values are found, not just never-skipped)
    SnapTable.append(spark, root,
      spark.range(0, 5).selectExpr("id + 50000 AS k",
        "CAST(77777 AS BIGINT) AS v"))
    val (df2, _, _) = SnapTable.readPoint(spark, root, "v", 77777L)
    assert(df2.count() == 5)
    // vacuum keeps the referenced sidecar; the index still prunes
    SnapTable.vacuum(root, retainVersions = 1)
    val (df3, read3, total3) = SnapTable.readPoint(spark, root, "v", probe)
    assert(df3.count() == expect)
    assert(read3 < total3)
    // compaction replaces every file — the index must be REBUILT over
    // the new files (same columns), not silently orphaned
    SnapTable.compact(spark, root, targetFiles = 6)
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.blooms.nonEmpty)
    val (df4, read4, total4) = SnapTable.readPoint(spark, root, "v", probe)
    assert(df4.count() == expect)
    assert(read4 < total4,
      s"post-compact bloom pruned nothing: $read4 of $total4")
  }

  test("bloom index on an INT column: build hashes in the probe's type") {
    // xxhash64 of an IntegerType column differs from the same value
    // hashed as a BIGINT literal — the build must cast, or every probe
    // is a false NEGATIVE (silently missing rows, the worst failure an
    // index can have)
    val root = Tmp.dir("bloom_int_spec")
    val base = spark.range(0, 4000)
      .selectExpr("id AS k", "CAST((id * 2654435761) % 4000 AS INT) AS vi")
    SnapTable.create(spark, root,
      base.repartitionByRange(6, col("k")), "k")
    SnapTable.addBloomIndex(spark, root, "vi")
    val probe = 1234L
    val expect = base.filter(col("vi") === probe).count()
    assert(expect > 0)
    val (df, read, total) = SnapTable.readPoint(spark, root, "vi", probe)
    assert(df.count() == expect,
      s"int-column bloom lost rows: ${df.count()} of $expect")
    assert(read < total)
    // unsupported (non-integral, non-string) column types are rejected
    // at build time instead of silently yielding false negatives
    val root2 = Tmp.dir("bloom_badtype_spec")
    SnapTable.create(spark, root2, spark.range(0, 10)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS d"), "k")
    intercept[IllegalArgumentException] {
      SnapTable.addBloomIndex(spark, root2, "d")
    }
  }

  test("re-index replaces same-column sidecars; appends keep the index " +
      "fresh; compact rebuilds at the declared fpp") {
    val root = Tmp.dir("bloom_fresh_spec")
    // v is EVEN, spans ~[0, 7998] in every file (uncorrelated with the
    // k layout), so range stats can never prune a probe inside that
    // span — only the bloom can
    val base = spark.range(0, 8000)
      .selectExpr("id AS k", "2 * ((id * 2654435761) % 4000) AS v")
    SnapTable.create(spark, root,
      base.repartitionByRange(8, col("k")), "k")
    SnapTable.addBloomIndex(spark, root, "v", fpp = 0.001)
    // a refresh RETIRES the previous sidecar for the column — the list
    // must not stack dead indexes that every probe would scan forever
    SnapTable.addBloomIndex(spark, root, "v", fpp = 0.001)
    val afterReindex = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(afterReindex.blooms.size == 1,
      s"re-index stacked sidecars: ${afterReindex.blooms}")
    // three appends: each one builds an incremental sidecar over just
    // its fresh files (also even-valued, full-span — unprunable by
    // range stats)
    (1 to 3).foreach { i =>
      SnapTable.append(spark, root,
        spark.range(0, 1000).selectExpr(s"id + ${90000 * i} AS k",
          s"2 * ((id * 48271 + $i * 7) % 4000) AS v"))
    }
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.blooms.size == 4, s"expected 1+3 sidecars: ${head.blooms}")
    // an ODD value: absent from every file yet inside every file's
    // [min,max]. Zero files read PROVES the appended files carry bloom
    // entries — an unindexed file is always read.
    val (dfMiss, readMiss, _) = SnapTable.readPoint(spark, root, "v", 4001L)
    assert(dfMiss.count() == 0)
    assert(readMiss == 0,
      s"miss probe read $readMiss files — appended files unindexed")
    // and a present value is still found exactly
    val (df, _, _) = SnapTable.readPoint(spark, root, "v", 2714L)
    assert(df.count() ==
      SnapTable.read(spark, root).filter(col("v") === 2714L).count())
    assert(df.count() > 0)
    // compaction rebuilds ONE sidecar per column, at the fpp the index
    // was created with (persisted in the sidecar rows, not defaulted)
    SnapTable.compact(spark, root, targetFiles = 6)
    val afterCompact = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(afterCompact.blooms.size == 1)
    val meta = spark.read
      .parquet(s"$root/${afterCompact.blooms.head}")
      .select("col", "fpp").distinct().collect()
    assert(meta.length == 1)
    assert(meta.head.getString(0) == "v")
    assert(meta.head.getDouble(1) == 0.001,
      s"compact rebuild lost the declared fpp: ${meta.head.getDouble(1)}")
  }

  test("string bloom + sstats point lookup prunes and stays exact") {
    val root = Tmp.dir("bloom_str_spec")
    val docs = T(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    SnapTable.create(spark, root,
      docs.repartitionByRange(8, col("doc_id")), "doc_id")
    SnapTable.addBloomIndex(spark, root, "source")
    val expect = docs.filter(col("source") === "src3").count()
    val (df, read, total) =
      SnapTable.readPoint(spark, root, "source", "src3")
    assert(df.count() == expect)
    assert(read <= total)
    // a value no file contains: bloom prunes EVERYTHING, zero rows
    val (dfMiss, readMiss, _) =
      SnapTable.readPoint(spark, root, "source", "no_such_source")
    assert(dfMiss.count() == 0)
    assert(readMiss == 0, s"absent value still read $readMiss files")
  }

  test("renameColumn is metadata-only: no file rewritten, old and new " +
      "files both resolve, stats/merge/time-travel follow") {
    val root = Tmp.dir("rename_spec")
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "id * 2 AS v",
        "concat('s', id) AS w").repartitionByRange(4, col("k")), "k")
    val before = SnapTable.load(root, 1).files
    SnapTable.renameColumn(root, "v", "val2")
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.files == before, "rename must not touch a data file")
    assert(head.colmap == Map("val2" -> "v"))
    // old files resolve the renamed column with their original values
    val df = SnapTable.read(spark, root)
    assert(df.columns.toSeq == Seq("k", "val2", "w"))
    assert(df.filter(col("val2") =!= col("k") * 2).count() == 0)
    // appends AFTER the rename write the PHYSICAL name — a mixed table
    // still reads uniformly
    SnapTable.append(spark, root,
      spark.range(100, 150).selectExpr("id AS k", "id * 2 AS val2",
        "concat('s', id) AS w"))
    val mixed = SnapTable.read(spark, root)
    assert(mixed.count() == 150)
    assert(mixed.filter(col("val2") =!= col("k") * 2).count() == 0)
    // manifest range stats keep pruning through the mapping
    val (rr, hit, total) = SnapTable.readRange(spark, root, "val2",
      10L, 40L)
    assert(rr.count() == 16) // val2 even, 10..40
    assert(hit < total, s"rename broke stats pruning: $hit/$total")
    // CoW merge via the NEW name
    SnapTable.merge(spark, root,
      spark.range(0, 5).selectExpr("id AS k",
        "CAST(-7 AS BIGINT) AS val2", "concat('m', id) AS w"), "k")
    assert(SnapTable.read(spark, root)
      .filter(col("val2") === -7).count() == 5)
    // time travel shows the schema AS OF the version
    assert(SnapTable.readVersion(spark, root, 1).columns.toSeq ==
      Seq("k", "v", "w"))
    // a rename chain back to the original name stays consistent
    SnapTable.renameColumn(root, "val2", "v")
    val back = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(back.colmap.isEmpty, s"identity rename must clear: ${back.colmap}")
    assert(SnapTable.read(spark, root)
      .filter(col("v") =!= col("k") * 2 && col("v") =!= -7).count() == 0)
  }

  test("dropColumn tombstones the physical name: a re-added column " +
      "cannot resurrect dropped values") {
    val root = Tmp.dir("drop_spec")
    SnapTable.create(spark, root,
      spark.range(50).selectExpr("id AS k", "concat('old', id) AS note"),
      "k")
    SnapTable.dropColumn(root, "note")
    val afterDrop = SnapTable.read(spark, root)
    assert(afterDrop.columns.toSeq == Seq("k"))
    // re-ADD a column with the dropped name: old files hold physical
    // 'note' bytes, so the new column must map to a FRESH physical name
    // and read as null for every pre-existing row
    SnapTable.addColumn(root, "note",
      org.apache.spark.sql.types.StringType)
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.dead == Seq("note"))
    assert(head.colmap.get("note").exists(_ != "note"),
      s"re-added column must get a fresh physical name: ${head.colmap}")
    val readd = SnapTable.read(spark, root)
    assert(readd.filter(col("note").isNotNull).count() == 0,
      "dropped values resurrected under the re-added column")
    // new appends populate the fresh physical; old rows stay null
    SnapTable.append(spark, root,
      spark.range(50, 60).selectExpr("id AS k", "concat('new', id) AS note"))
    val after = SnapTable.read(spark, root)
    assert(after.filter(col("note").isNotNull).count() == 10)
    assert(after.filter(col("note").startsWith("old")).count() == 0)
    // (a stats-column drop RETIRES the role instead of refusing —
    // covered by its own test below; semantic references still refuse)
    // RENAME rewrites contract references: the check follows the new name and
    // still rejects violating appends
    SnapTable.addCheck(spark, root, "k_nonneg", "k >= 0")
    SnapTable.renameColumn(root, "k", "key")
    val headR = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(headR.statsCol == "key")
    assert(headR.checks("k_nonneg").contains("key"),
      s"check must follow the rename: ${headR.checks}")
    intercept[SnapTable.ConstraintViolationException] {
      SnapTable.append(spark, root,
        spark.range(1).selectExpr("CAST(-5 AS BIGINT) AS key",
          "concat('x', id) AS note"))
    }
  }

  test("dropColumn retires index/stats references: bloom sidecars " +
      "leave the manifest (vacuum reclaims them), a stats-column drop " +
      "clears the role, semantic references still refuse") {
    val root = Tmp.dir("drop_retire_spec")
    SnapTable.create(spark, root,
      spark.range(2000).selectExpr("id AS k",
        "(id * 2654435761) % 10000 AS v", "id % 7 AS w"), "k")
    SnapTable.addBloomIndex(spark, root, "v")
    assert(SnapTable.load(root, SnapTable.latestVersion(root))
      .blooms.nonEmpty)
    // drop the INDEXED column: succeeds, sidecars retired with it
    SnapTable.dropColumn(root, "v")
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.blooms.isEmpty,
      s"dropped column's sidecars must retire: ${head.blooms}")
    assert(SnapTable.read(spark, root).columns.toSeq == Seq("k", "w"))
    // ...and vacuum reclaims the now-unreferenced sidecar dir
    SnapTable.vacuum(root, retainVersions = 1)
    val bxDirs = java.nio.file.Files.list(
        java.nio.file.Paths.get(root, "data")).iterator()
    val hasBx = Iterator.continually(bxDirs)
      .takeWhile(_.hasNext).map(_.next())
      .exists(_.getFileName.toString.startsWith("bx-"))
    assert(!hasBx, "vacuum must reclaim the retired bloom sidecar dir")
    // drop the STATS column: the role retires instead of refusing
    SnapTable.dropColumn(root, "k")
    val head2 = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head2.statsCol == "", s"stats role: '${head2.statsCol}'")
    assert(SnapTable.read(spark, root).columns.toSeq == Seq("w"))
    // the table stays fully operational without a stats role:
    // append, compact (plain repartition — no cluster key), read
    SnapTable.append(spark, root,
      spark.range(10).selectExpr("id % 7 AS w"))
    SnapTable.compact(spark, root, targetFiles = 2)
    assert(SnapTable.read(spark, root).count() == 2010)
    assert(SnapTable.read(spark, root)
      .groupBy("w").count().count() == 7)
    // semantic references still refuse: CHECK constraint
    val root2 = Tmp.dir("drop_refuse_spec")
    SnapTable.create(spark, root2,
      spark.range(10).selectExpr("id AS k", "id AS a", "id AS b"), "k")
    SnapTable.addCheck(spark, root2, "a_pos", "a >= 0")
    intercept[IllegalArgumentException] {
      SnapTable.dropColumn(root2, "a")
    }
  }

  test("rename follows layout + contract references: bucket column, " +
      "partition spec, and generation expressions re-point") {
    // bucket column rename: layout metadata follows, files untouched
    val broot = Tmp.dir("rename_bucket_spec")
    SnapTable.createBucketed(spark, broot,
      spark.range(1000).selectExpr("id AS k", "id % 50 AS g"),
      "k", "g", 4)
    val filesBefore = SnapTable.load(broot, 1).files
    SnapTable.renameColumn(broot, "g", "grp")
    val bhead = SnapTable.load(broot, SnapTable.latestVersion(broot))
    assert(bhead.bucket.contains(("grp", 4)))
    assert(bhead.files == filesBefore)
    // bucket-clustered appends still work through the renamed layout
    SnapTable.append(spark, broot,
      spark.range(1000, 1100).selectExpr("id AS k", "id % 50 AS grp"))
    assert(SnapTable.read(spark, broot).count() == 1100)
    // spec + generation expression rename
    val sroot = Tmp.dir("rename_spec_spec")
    SnapTable.create(spark, sroot,
      spark.range(100).selectExpr("id AS k", "id * 2 AS d"),
      "k", spec = Seq("d"))
    SnapTable.addGenerated(spark, sroot, "d", "k * 2")
    SnapTable.renameColumn(sroot, "d", "day")
    val shead = SnapTable.load(sroot, SnapTable.latestVersion(sroot))
    assert(shead.spec == Seq("day"))
    assert(shead.gen.contains("day") && !shead.gen.contains("d"))
    // a generated-column violation still fails under the NEW name
    intercept[SnapTable.ConstraintViolationException] {
      SnapTable.append(spark, sroot,
        spark.range(1).selectExpr("id + 500 AS k", "CAST(7 AS BIGINT) AS day"))
    }
    // rename of a column REFERENCED by the gen expression rewrites it
    SnapTable.renameColumn(sroot, "k", "key")
    val shead2 = SnapTable.load(sroot, SnapTable.latestVersion(sroot))
    assert(shead2.gen("day").contains("key"), s"gen=${shead2.gen}")
    SnapTable.append(spark, sroot,
      spark.range(500, 510).selectExpr("id AS key")) // day computed
    assert(SnapTable.read(spark, sroot)
      .filter(col("day") =!= col("key") * 2).count() == 0)
  }

  test("bloom index keys on physical names: pruning survives a rename") {
    val root = Tmp.dir("bloom_rename_spec")
    val base = spark.range(0, 6000)
      .selectExpr("id AS k", "(id * 2654435761) % 6000 AS v")
    SnapTable.create(spark, root,
      base.repartitionByRange(6, col("k")), "k")
    SnapTable.addBloomIndex(spark, root, "v")
    SnapTable.renameColumn(root, "v", "u")
    val probe = 4321L
    val expect = base.filter(col("v") === probe).count()
    assert(expect > 0)
    val (df, read, total) = SnapTable.readPoint(spark, root, "u", probe)
    assert(df.count() == expect)
    assert(read < total,
      s"bloom stopped pruning after the rename: $read/$total")
    // compaction on the column-mapped table: rewrites through the
    // mapping, rebuilds the index via the physical→logical reverse map
    SnapTable.compact(spark, root, targetFiles = 4)
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.blooms.size == 1)
    val (df2, read2, total2) = SnapTable.readPoint(spark, root, "u", probe)
    assert(df2.count() == expect)
    assert(read2 < total2,
      s"post-compact bloom pruned nothing: $read2/$total2")
    assert(SnapTable.read(spark, root)
      .filter(col("u") =!= (col("k") * 2654435761L) % 6000).count() == 0)
  }

  test("addColumn is a metadata-only commit; old files null-fill") {
    val root = freshTable()
    val filesBefore = SnapTable.load(root, SnapTable.latestVersion(root))
      .files
    val v = SnapTable.addColumn(root, "note",
      org.apache.spark.sql.types.StringType)
    val head = SnapTable.load(root, v)
    assert(head.files == filesBefore) // no data rewritten or added
    val df = SnapTable.read(spark, root)
    assert(df.columns.contains("note"))
    assert(df.filter(col("note").isNotNull).count() == 0)
    intercept[IllegalArgumentException] {
      SnapTable.addColumn(root, "note",
        org.apache.spark.sql.types.StringType)
    }
  }
}
