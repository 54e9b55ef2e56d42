package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.SnapTable

/** Branch/tag refs and write-audit-publish — the physical contracts the
  * `table_branch_wap` oracle cannot see: zero-copy forks (hard links, not
  * rewrites), publish fast-forward vs append-rebase vs divergence abort,
  * tag immutability, and vacuum honoring refs as live roots.
  */
class RefsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def freshTable(): String = {
    val root = Tmp.dir("refs_spec")
    val o = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    SnapTable.create(spark, root,
      o.repartitionByRange(4, col("o_orderkey")), "o_orderkey")
    root
  }

  private def inode(p: java.nio.file.Path): Any =
    java.nio.file.Files.getAttribute(p, "unix:ino")

  test("branch isolates writes; fast-forward publish adopts them by link") {
    val root = freshTable()
    val n0 = SnapTable.read(spark, root).count()
    SnapTable.createBranch(spark, root, "wap")
    val b = SnapTable.branchRoot(root, "wap")
    SnapTable.append(spark, b, SnapTable.read(spark, root).limit(50))
    // isolation: the branch grew, main did not
    assert(SnapTable.read(spark, b).count() == n0 + 50)
    assert(SnapTable.read(spark, root).count() == n0)
    val v = SnapTable.publishBranch(spark, root, "wap")
    assert(SnapTable.read(spark, root).count() == n0 + 50)
    // zero-copy: every published file is the SAME inode as the branch's
    val published = SnapTable.load(root, v).files
      .filter(_.path.startsWith("data/"))
      .map(f => java.nio.file.Paths.get(root).resolve(f.path).normalize)
    assert(published.nonEmpty)
    val branchOwned = SnapTable.load(b, SnapTable.latestVersion(b)).files
      .map(f => java.nio.file.Paths.get(b).resolve(f.path).normalize)
      .filter(_.startsWith(java.nio.file.Paths.get(b)))
    val branchInodes = branchOwned.map(inode).toSet
    val freshPublished = published.filterNot(p =>
      SnapTable.load(root, 1).files.exists(f =>
        java.nio.file.Paths.get(root).resolve(f.path).normalize == p))
    assert(freshPublished.forall(p => branchInodes.contains(inode(p))))
    // branch drop cannot break main: hard links keep the bytes alive
    SnapTable.dropBranch(root, "wap")
    assert(SnapTable.read(spark, root).count() == n0 + 50)
  }

  test("publish onto a moved main rebases append-only branches, once") {
    val root = freshTable()
    val n0 = SnapTable.read(spark, root).count()
    SnapTable.createBranch(spark, root, "feed")
    val b = SnapTable.branchRoot(root, "feed")
    SnapTable.append(spark, b, SnapTable.read(spark, root).limit(30))
    // main moves concurrently
    SnapTable.append(spark, root, SnapTable.read(spark, root).limit(20))
    val v = SnapTable.publishBranch(spark, root, "feed")
    assert(SnapTable.read(spark, root).count() == n0 + 20 + 30)
    // a retried publish is a duplicate delivery: the txn dedups it
    assert(SnapTable.publishBranch(spark, root, "feed") == v)
    assert(SnapTable.read(spark, root).count() == n0 + 20 + 30)
  }

  test("publish of a transformed branch onto a moved main aborts") {
    val root = freshTable()
    SnapTable.createBranch(spark, root, "risky")
    val b = SnapTable.branchRoot(root, "risky")
    SnapTable.deleteWhere(spark, b, col("o_orderkey") % 2 === 0)
    SnapTable.append(spark, root, SnapTable.read(spark, root).limit(5))
    val e = intercept[SnapTable.ConcurrentCommitException] {
      SnapTable.publishBranch(spark, root, "risky")
    }
    assert(e.getMessage.contains("delete"))
  }

  test("tags are immutable pins; vacuum keeps tagged versions readable") {
    val root = freshTable()
    val n0 = SnapTable.read(spark, root).count()
    SnapTable.createTag(root, "gold")
    intercept[SnapTable.ConcurrentCommitException] {
      SnapTable.createTag(root, "gold")
    }
    // the table moves on: delete half, then append — 3 versions total
    SnapTable.deleteWhere(spark, root, col("o_orderkey") % 2 === 0)
    SnapTable.append(spark, root, SnapTable.read(spark, root).limit(10))
    SnapTable.vacuum(root, retainVersions = 1)
    // v1 survived vacuum because the tag pins it
    assert(SnapTable.readTag(spark, root, "gold").count() == n0)
    assert(SnapTable.tags(root) == Seq("gold" -> 1))
    SnapTable.dropTag(root, "gold")
    SnapTable.vacuum(root, retainVersions = 1)
    assert(SnapTable.versions(root).size == 1)
  }

  test("vacuum keeps main files a live branch still references") {
    val root = freshTable()
    val n0 = SnapTable.read(spark, root).count()
    SnapTable.createBranch(spark, root, "longlived")
    val b = SnapTable.branchRoot(root, "longlived")
    // main rewrites everything (compact) — v1's files become dead to
    // main, but the branch still reads them
    SnapTable.compact(spark, root, targetFiles = 2)
    SnapTable.vacuum(root, retainVersions = 1)
    assert(SnapTable.read(spark, b).count() == n0)
  }

  test("branch of a bucketed table keeps the layout; generated columns " +
      "survive branch writes and publish") {
    val root = Tmp.dir("refs_bucket_spec")
    val base = spark.range(0, 2000)
      .selectExpr("id AS k", "id * 3 AS v")
    SnapTable.createBucketed(spark, root, base, "k", "k", numBuckets = 4)
    SnapTable.addGenerated(spark, root, "v", "k * 3")
    SnapTable.createBranch(spark, root, "feature")
    val b = SnapTable.branchRoot(root, "feature")
    // the clone must carry bucket + gen: this append has to (a) compute
    // the generated column and (b) write bucketed files with _gfb stats
    SnapTable.append(spark, b,
      spark.range(2000, 2500).selectExpr("id AS k"))
    val bHead = SnapTable.load(b, SnapTable.latestVersion(b))
    assert(bHead.bucket.contains(("k", 4)), s"branch lost bucket: $bHead")
    assert(bHead.gen == Map("v" -> "k * 3"), "branch lost generated cols")
    assert(bHead.files.forall(_.stats.contains(SnapTable.BucketStatsCol)),
      "branch-written files lack bucket stats")
    val v = SnapTable.publishBranch(spark, root, "feature")
    // published snapshot: every file has the bucket stats the manifest's
    // bucket claim requires (the native SPJ scan groups by them)
    val head = SnapTable.load(root, v)
    assert(head.bucket.contains(("k", 4)))
    assert(head.files.forall(_.stats.contains(SnapTable.BucketStatsCol)),
      "published snapshot claims a bucket layout its files lack")
    assert(SnapTable.read(spark, root).count() == 2500)
    assert(SnapTable.read(spark, root)
      .filter(col("v") =!= col("k") * 3).count() == 0)
  }

  test("fast-forward publish does not inherit main's stale DVs") {
    val root = freshTable()
    val n0 = SnapTable.read(spark, root).count()
    // main takes a MoR delete → head carries a deletion vector
    val del = SnapTable.read(spark, root)
      .orderBy(col("o_orderkey")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    SnapTable.deleteWhereMoR(spark, root,
      col("o_orderkey").isInCollection(del))
    assert(SnapTable.load(root, SnapTable.latestVersion(root))
      .dvs.nonEmpty)
    SnapTable.createBranch(spark, root, "hygiene")
    val b = SnapTable.branchRoot(root, "hygiene")
    // the branch compacts (materializing its re-based DVs) then publishes;
    // the published manifest's file list is the branch's, so inheriting
    // main's DV dirs would pin stale dirs referencing absent files
    SnapTable.compact(spark, b, targetFiles = 2)
    val v = SnapTable.publishBranch(spark, root, "hygiene")
    val head = SnapTable.load(root, v)
    assert(head.dvs.isEmpty,
      s"fast-forward publish carried stale DVs: ${head.dvs}")
    assert(SnapTable.read(spark, root).count() == n0 - 5)
  }

  test("defaults-bearing main branches and publishes without compact: " +
      "era watermark carries through fork and fast-forward") {
    val root = Tmp.dir("refs_defaults")
    SnapTable.create(spark, root,
      spark.range(10).selectExpr("id AS k"), "k")
    SnapTable.append(spark, root, spark.range(10, 15)
      .selectExpr("id AS k"))                          // v2
    SnapTable.addColumn(root, "v",
      org.apache.spark.sql.types.LongType, Some("9")) // v3, threshold 3
    SnapTable.createBranch(spark, root, "feat")
    val b = SnapTable.branchRoot(root, "feat")
    // branch-written rows hold explicit values: the explicit NULL must
    // survive the branch's restarted version space AND the publish
    SnapTable.append(spark, b, spark.range(15, 18)
      .selectExpr("id AS k", "CAST(NULL AS BIGINT) AS v"))
    val v = SnapTable.publishBranch(spark, root, "feat")
    val head = SnapTable.load(root, v)
    assert(head.defaults.contains("v"), "publish must carry defaults")
    val r = SnapTable.read(spark, root)
    assert(r.filter(col("v") === 9).count() == 15,
      "pre-add rows must keep the fill after publish")
    assert(r.filter(col("k") >= 15 && col("v").isNull).count() == 3,
      "branch-written explicit NULLs must stay NULL after publish")
    // post-publish main writes stamp above the joint watermark too
    SnapTable.append(spark, root, spark.range(18, 20)
      .selectExpr("id AS k", "CAST(NULL AS BIGINT) AS v"))
    assert(SnapTable.read(spark, root)
      .filter(col("v").isNull).count() == 5)
  }

  test("catalog VERSION AS OF resolves tags and branches by name") {
    val wh = Tmp.dir("refs_cat")
    val s = spark
    s.conf.getOption("spark.sql.catalog.snapref") match {
      case None =>
        s.conf.set("spark.sql.catalog.snapref",
          classOf[graft.sources.SnapCatalog].getName)
        s.conf.set("spark.sql.catalog.snapref.root", wh)
      case Some(_) => ()
    }
    s.sql("CREATE NAMESPACE IF NOT EXISTS snapref.db")
    s.sql("CREATE TABLE snapref.db.reft (k BIGINT, v BIGINT)")
    s.sql("INSERT INTO snapref.db.reft VALUES (1, 10), (2, 20)")
    val dir = java.nio.file.Paths.get(wh, "db", "reft").toString
    SnapTable.createTag(dir, "first")
    SnapTable.createBranch(spark, dir, "dev")
    val b = SnapTable.branchRoot(dir, "dev")
    SnapTable.append(spark, b,
      s.sql("SELECT CAST(3 AS BIGINT) k, CAST(30 AS BIGINT) v"))
    s.sql("INSERT INTO snapref.db.reft VALUES (4, 40)")
    assert(s.sql(
      "SELECT count(*) FROM snapref.db.reft VERSION AS OF 'first'")
      .head().getLong(0) == 2)
    assert(s.sql(
      "SELECT count(*) FROM snapref.db.reft VERSION AS OF 'dev'")
      .head().getLong(0) == 3)
    assert(s.sql("SELECT count(*) FROM snapref.db.reft")
      .head().getLong(0) == 3)
  }
}
