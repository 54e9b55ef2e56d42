package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{SnapCatalog, SnapTable}

/** SQL MERGE INTO / UPDATE through the DSv2 row-level-operation API:
  * result semantics are oracle-checked by `table_sql_merge`; this spec
  * pins the PHYSICAL contracts — group-based copy-on-write at FILE
  * granularity (only files containing a matched key rewrite; the runtime
  * group filter narrows the scan), the `_file` metadata column, and
  * CHECK-constraint enforcement on the rewrite.
  */
class SqlMergeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val base: String = {
    val b = Tmp.dir("sqlmerge_spec")
    spark.conf.set("spark.sql.catalog.smt", classOf[SnapCatalog].getName)
    spark.conf.set("spark.sql.catalog.smt.root", b)
    b
  }

  test("MERGE: matched update, matched delete, unmatched insert") {
    val root = s"$base/db/m1"
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        .repartitionByRange(4, col("k")), "k")
    spark.range(90, 110)
      .selectExpr("id AS k", "CAST(-1.0 AS DOUBLE) AS v",
        "id % 2 = 0 AS del")
      .createOrReplaceTempView("m1_src")
    spark.sql(
      """MERGE INTO smt.db.m1 t USING m1_src s ON t.k = s.k
        |WHEN MATCHED AND s.del THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |""".stripMargin)
    val got = spark.sql("SELECT k, v FROM smt.db.m1 ORDER BY k").collect()
    // expected: 0..89 untouched; 90..99 matched (even k deleted, odd k
    // v=-1); 100..109 inserted with v=-1
    val expect =
      (0L until 90L).map(k => (k, k.toDouble)) ++
      (90L until 100L).filter(_ % 2 == 1).map(k => (k, -1.0)) ++
      (100L until 110L).map(k => (k, -1.0))
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      expect.sortBy(_._1))
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.op == "merge-sql")
  }

  test("MERGE rewrites ONLY files containing a matched key") {
    val root = s"$base/db/m2"
    // two widely separated key ranges → two disjoint file sets
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(2, col("k")), "k")
    SnapTable.append(spark, root,
      spark.range(1000000, 1000100)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(2, col("k")))
    val before = SnapTable.load(root, SnapTable.latestVersion(root))
    // the files that CONTAIN a matched key (10..19) — the only legal
    // rewrite set; everything else must carry forward by reference
    val matched = before.files.filter { f =>
      val (lo, hi) = f.stats("k"); hi >= 10L && lo <= 19L
    }.map(_.path).toSet
    val untouched = before.files.map(_.path).toSet -- matched
    assert(matched.nonEmpty && untouched.nonEmpty)
    spark.range(10, 20).selectExpr("id AS k", "CAST(0 AS BIGINT) AS v")
      .createOrReplaceTempView("m2_src")
    spark.sql(
      """MERGE INTO smt.db.m2 t USING m2_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    val after = SnapTable.load(root, SnapTable.latestVersion(root))
    val afterPaths = after.files.map(_.path).toSet
    assert(untouched.subsetOf(afterPaths),
      s"untouched files must carry forward: ${untouched -- afterPaths}")
    assert(matched.intersect(afterPaths).isEmpty,
      "matched files must be replaced")
    // and the table content is right
    assert(spark.sql(
      "SELECT sum(v) FROM smt.db.m2 WHERE k BETWEEN 10 AND 19")
      .collect()(0).getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) FROM smt.db.m2")
      .collect()(0).getLong(0) == 200L)
  }

  test("UPDATE statement routes through the same CoW path") {
    val root = s"$base/db/u1"
    SnapTable.create(spark, root,
      spark.range(50).selectExpr("id AS k", "CAST(1.0 AS DOUBLE) AS v"),
      "k")
    spark.sql("UPDATE smt.db.u1 SET v = 9.0 WHERE k >= 40")
    val got = spark.sql(
      "SELECT sum(CAST(v AS BIGINT)) FROM smt.db.u1").collect()(0)
    assert(got.getLong(0) == 40L * 1 + 10L * 9)
    assert(SnapTable.load(root, SnapTable.latestVersion(root))
      .op == "update-sql")
  }

  test("_file metadata column reads through SQL") {
    val root = s"$base/db/f1"
    SnapTable.create(spark, root,
      spark.range(10).selectExpr("id AS k"), "k")
    val files = spark.sql("SELECT DISTINCT _file FROM smt.db.f1")
      .collect().map(_.getString(0)).toSet
    val manifest = SnapTable.load(root, 1).files.map(_.path).toSet
    assert(files == manifest)
  }

  test("MERGE enforces CHECK constraints on the rewrite") {
    val root = s"$base/db/c1"
    SnapTable.create(spark, root,
      spark.range(10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
      "k")
    SnapTable.addCheck(spark, root, "v_nonneg", "v >= 0")
    spark.range(5, 8).selectExpr("id AS k", "CAST(-5.0 AS DOUBLE) AS v")
      .createOrReplaceTempView("c1_src")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO smt.db.c1 t USING c1_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(
      _.isInstanceOf[SnapTable.ConstraintViolationException]),
      s"expected ConstraintViolationException, got $e")
    // and nothing committed
    assert(spark.sql("SELECT min(v) FROM smt.db.c1")
      .collect()(0).getDouble(0) == 0.0)
  }
}
