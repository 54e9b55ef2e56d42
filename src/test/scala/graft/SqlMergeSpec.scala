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

  test("MERGE/UPDATE on a BUCKETED table re-lays the rewrite into the " +
      "bucket scheme: every file keeps a single-bucket claim") {
    val root = s"$base/db/mb"
    SnapTable.createBucketed(spark, root,
      spark.range(200).selectExpr("id AS k", "id * 3 AS v"),
      "k", "k", 4)
    spark.range(150, 230).selectExpr("id AS k", "CAST(-7 AS BIGINT) AS v")
      .createOrReplaceTempView("mb_src")
    spark.sql(
      """MERGE INTO smt.db.mb t USING mb_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |""".stripMargin)
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.bucket.contains(("k", 4)), s"layout kept: ${head.bucket}")
    // the rewritten files (like every other file) claim exactly one
    // bucket, and the claim matches the write hash — without this the
    // native scan's bucket grouping fails on the next read
    head.files.foreach { f =>
      val (lo, hi) = f.stats.getOrElse(SnapTable.BucketStatsCol,
        fail(s"${f.path} lost its bucket stats after the SQL rewrite"))
      assert(lo == hi && lo >= 0 && lo < 4, s"${f.path}: [$lo,$hi]")
    }
    // and the table still reads through the native bucketed scan
    val got = spark.sql("SELECT k, v FROM smt.db.mb ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = (0L until 150L).map(k => (k, k * 3)) ++
      (150L until 230L).map(k => (k, -7L))
    assert(got == expect)
    // UPDATE takes the same path
    spark.sql("UPDATE smt.db.mb SET v = 0 WHERE k < 10")
    val h2 = SnapTable.load(root, SnapTable.latestVersion(root))
    h2.files.foreach { f =>
      assert(f.stats.contains(SnapTable.BucketStatsCol), f.path)
    }
    assert(spark.sql("SELECT sum(v) FROM smt.db.mb WHERE k < 10")
      .head().getLong(0) == 0L)
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

  test("MERGE on a MoR-deleted table reads through the DVs — no " +
      "compaction required, nothing resurrects") {
    val root = s"$base/db/mor1"
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "id * 10 AS v")
        .repartitionByRange(4, col("k")), "k")
    // MoR-delete keys 0..9: the files keep the rows, a DV hides them
    SnapTable.deleteWhereMoR(spark, root, col("k") < 10)
    assert(SnapTable.load(root, SnapTable.latestVersion(root))
      .dvs.nonEmpty)
    // source matches BOTH deleted keys (5..9 — must behave as absent →
    // inserts) and live keys (10..14 — updates)
    spark.range(5, 15).selectExpr("id AS k", "CAST(-1 AS BIGINT) AS v")
      .createOrReplaceTempView("mor1_src")
    spark.sql(
      """MERGE INTO smt.db.mor1 t USING mor1_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |""".stripMargin)
    val got = spark.sql("SELECT k, v FROM smt.db.mor1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 0..4 stay deleted; 5..14 have v=-1 (re-insert / update); 15..99
    // untouched. A resurrected DV'd row would surface k∈0..4 or a
    // duplicate k∈5..9.
    val expect = (5L until 15L).map(k => (k, -1L)) ++
      (15L until 100L).map(k => (k, k * 10))
    assert(got == expect.sortBy(_._1), s"got ${got.take(20)}")
  }

  test("UPDATE on a MoR-deleted table: DV'd rows neither match nor " +
      "resurrect; carried files keep their DVs live") {
    val root = s"$base/db/mor2"
    // two disjoint key ranges → disjoint file sets, so the UPDATE
    // rewrites one file set while the OTHER's DV must stay live
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "id AS v")
        .repartitionByRange(2, col("k")), "k")
    SnapTable.append(spark, root,
      spark.range(1000000, 1000100).selectExpr("id AS k", "id AS v")
        .repartitionByRange(2, col("k")))
    // DV-delete five rows in EACH range
    SnapTable.deleteWhereMoR(spark, root,
      col("k").isin(0L, 1L, 2L, 3L, 4L,
        1000000L, 1000001L, 1000002L, 1000003L, 1000004L))
    // update only the low range (including DV'd keys 0..4, which must
    // NOT come back)
    spark.sql("UPDATE smt.db.mor2 SET v = -1 WHERE k < 50")
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(head.dvs.nonEmpty,
      "carried files' deletion vectors must survive the partial rewrite")
    val got = spark.sql(
      "SELECT count(*) AS n, sum(CASE WHEN v = -1 THEN 1 ELSE 0 END) " +
        "AS upd, min(k) AS mk FROM smt.db.mor2").collect()(0)
    assert(got.getLong(0) == 190, s"rows: ${got.getLong(0)}") // 200 - 10
    assert(got.getLong(1) == 45, s"updated: ${got.getLong(1)}") // 5..49
    assert(got.getLong(2) == 5L, "a DV'd row resurrected")
    // and the high range's DV still applies
    assert(spark.sql(
      "SELECT count(*) FROM smt.db.mor2 WHERE k >= 1000000")
      .collect()(0).getLong(0) == 95)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: unmatched target rows update " +
      "or delete across the full candidate set") {
    val root = s"$base/db/nms1"
    // two disjoint key ranges → disjoint file sets; the source only
    // matches the LOW range, so the BY SOURCE clauses must reach the
    // high-range files even though no source row joins them (the group
    // filter cannot narrow to matched files for these clauses)
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k", "id AS v")
        .repartitionByRange(2, col("k")), "k")
    SnapTable.append(spark, root,
      spark.range(1000000, 1000050).selectExpr("id AS k", "id AS v")
        .repartitionByRange(2, col("k")))
    spark.range(0, 50).selectExpr("id AS k", "CAST(-1 AS BIGINT) AS v")
      .createOrReplaceTempView("nms1_src")
    spark.sql(
      """MERGE INTO smt.db.nms1 t USING nms1_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED BY SOURCE AND t.k >= 1000000 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v + 1000
        |""".stripMargin)
    val got = spark.sql("SELECT k, v FROM smt.db.nms1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 0..49 matched → v=-1; 50..99 unmatched-by-source → v=k+1000;
    // 1000000.. deleted entirely
    val expect = (0L until 50L).map(k => (k, -1L)) ++
      (50L until 100L).map(k => (k, k + 1000))
    assert(got == expect.sortBy(_._1),
      s"got ${got.take(10)}...${got.takeRight(5)}")
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
    // either guard may fire first: Spark's own enforcement (the table
    // REPORTS its checks via constraints(), so the MERGE plan carries
    // a CheckInvariant that throws during the rewrite) or the engine's
    // pre-commit batch validation — both abort before any link
    assert(chain(e).exists(t =>
      t.isInstanceOf[SnapTable.ConstraintViolationException] ||
        String.valueOf(t.getMessage).contains("CHECK_CONSTRAINT")),
      s"expected a constraint violation, got $e")
    // and nothing committed
    assert(spark.sql("SELECT min(v) FROM smt.db.c1")
      .collect()(0).getDouble(0) == 0.0)
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns are ADDED to " +
      "the target (metadata commit), untouched rows null-fill") {
    val root = s"$base/db/se1"
    SnapTable.create(spark, root,
      spark.range(20).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        .repartitionByRange(2, col("k")), "k")
    spark.range(15, 25)
      .selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS v",
        "concat('t', id) AS tag")
      .createOrReplaceTempView("se1_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO smt.db.se1 t
        |USING se1_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |""".stripMargin)
    val head = SnapTable.load(root, SnapTable.latestVersion(root))
    assert(SnapTable.schemaOf(head.schemaJson).fieldNames
      .contains("tag"), "schema evolution must add the source column")
    val got = spark.sql(
      "SELECT k, v, tag FROM smt.db.se1 ORDER BY k").collect()
    assert(got.length == 25)
    // untouched pre-evolution rows read NULL for the new column
    assert(got.take(15).forall(_.isNullAt(2)))
    // matched + inserted rows carry the source values
    assert(got.drop(15).forall(r => r.getString(2) == s"t${r.getLong(0)}"
      && r.getDouble(1) == r.getLong(0) * 2.0))
  }
}
