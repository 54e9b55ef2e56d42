package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{SnapCatalog, SnapTable}

/** `CALL snap.system.<proc>(…)` — the DSv2 ProcedureCatalog surface. */
class SqlProcedureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val base: String = {
    val b = Tmp.dir("sqlproc_spec")
    spark.conf.set("spark.sql.catalog.spc", classOf[SnapCatalog].getName)
    spark.conf.set("spark.sql.catalog.spc.root", b)
    b
  }

  test("CALL compact / vacuum / rollback round trip") {
    val root = s"$base/db/t"
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "id AS v")
        .repartition(8), "k")
    SnapTable.append(spark, root,
      spark.range(100, 120).selectExpr("id AS k", "id AS v")
        .repartition(4))
    val before = SnapTable.load(root, SnapTable.latestVersion(root))
      .files.size
    assert(before >= 10)
    val r = spark.sql("CALL spc.system.compact('db.t', 2)").collect()
    assert(r.length == 1 && r(0).getLong(0) == 3,
      "compact commits v3 and reports it")
    val after = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(after.files.size <= 2)
    assert(spark.sql("SELECT count(*) FROM spc.db.t").head().getLong(0)
      == 120)
    // rollback to v2 (pre-compaction CONTENTS, new version)
    val rb = spark.sql("CALL spc.system.rollback('db.t', 2)").collect()
    assert(rb(0).getLong(0) == 4)
    assert(spark.sql("SELECT count(*) FROM spc.db.t").head().getLong(0)
      == 120)
    // vacuum keeps the table readable
    spark.sql("CALL spc.system.vacuum('db.t', 1)").collect()
    assert(spark.sql("SELECT count(*) FROM spc.db.t").head().getLong(0)
      == 120)
  }

  test("CALL create_tag / create_branch / publish_branch") {
    val root = s"$base/db/b"
    SnapTable.create(spark, root,
      spark.range(10).selectExpr("id AS k", "id AS v"), "k")
    SnapTable.append(spark, root,
      spark.range(10, 15).selectExpr("id AS k", "id AS v"))
    spark.sql("CALL spc.system.create_tag('db.b', 'first', 1)").collect()
    // tag resolves through VERSION AS OF
    assert(spark.sql(
      "SELECT count(*) FROM spc.db.b VERSION AS OF 'first'")
      .head().getLong(0) == 10)
    spark.sql("CALL spc.system.create_branch('db.b', 'wap')").collect()
    // write to the branch root, publish, see the rows on main
    SnapTable.append(spark, SnapTable.branchRoot(root, "wap"),
      spark.range(15, 18).selectExpr("id AS k", "id AS v"))
    val p = spark.sql(
      "CALL spc.system.publish_branch('db.b', 'wap')").collect()
    assert(p(0).getLong(0) >= 3)
    assert(spark.sql("SELECT count(*) FROM spc.db.b").head().getLong(0)
      == 18)
  }

  test("omitted trailing args take their declared defaults") {
    val root = s"$base/db/d"
    SnapTable.create(spark, root,
      spark.range(80).selectExpr("id AS k", "id AS v")
        .repartition(8), "k")
    // compact() with no target: quarter-the-file-count (8 → 2)
    spark.sql("CALL spc.system.compact('db.d')").collect()
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.files.size <= 2, s"got ${head.files.size} files")
    // vacuum() with no retention: live snapshot only, table readable
    spark.sql("CALL spc.system.vacuum('db.d')").collect()
    assert(spark.sql("SELECT count(*) FROM spc.db.d").head().getLong(0)
      == 80)
  }

  test("CALL vacuum with no retention honors the table's declared " +
      "snap.vacuum.retainVersions property") {
    val root = s"$base/db/vr"
    SnapTable.create(spark, root,
      spark.range(10).selectExpr("id AS k", "id AS v"), "k")       // v1
    spark.sql("ALTER TABLE spc.db.vr SET TBLPROPERTIES (" +
      "'snap.vacuum.retainVersions' = '3')")                       // v2
    SnapTable.append(spark, root,
      spark.range(10, 20).selectExpr("id AS k", "id AS v"))        // v3
    SnapTable.append(spark, root,
      spark.range(20, 30).selectExpr("id AS k", "id AS v"))        // v4
    spark.sql("CALL spc.system.vacuum('db.vr')").collect()
    // declared retention (3) keeps v2..v4 (plus any filesRef closure);
    // a live-only default would have dropped v2
    assert(Set(2, 3, 4).subsetOf(SnapTable.versions(root).toSet),
      "procedure default = the table's declared retention (3), " +
        s"not live-only; got ${SnapTable.versions(root)}")
    // an explicit retention still wins over the property
    spark.sql("CALL spc.system.vacuum('db.vr', 1)").collect()
    assert(!SnapTable.versions(root).contains(2) &&
      SnapTable.versions(root).contains(4),
      s"explicit retain=1 wins: got ${SnapTable.versions(root)}")
    assert(spark.sql("SELECT count(*) FROM spc.db.vr").head()
      .getLong(0) == 30)
  }

  test("unknown procedure names fail with the catalog's listing") {
    val e = intercept[Exception] {
      spark.sql("CALL spc.system.nonsense('db.t')").collect()
    }
    assert(e.getMessage.contains("unknown procedure") ||
      e.getMessage.contains("nonsense"), e.getMessage)
  }
}
