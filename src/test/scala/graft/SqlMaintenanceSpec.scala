package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.SnapTable

/** The maintenance-verb parser extension: OPTIMIZE / VACUUM / DESCRIBE
  * HISTORY parse through the REAL `spark.sql` path (TestSpark builds its
  * session with graft.GraftExtensions), regular SQL still delegates, and
  * OPTIMIZE ZORDER leaves a layout that prunes on both dimensions.
  */
class SqlMaintenanceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat(): String = {
    spark.conf.getOption("spark.sql.catalog.snapm.root").getOrElse {
      val b = Tmp.dir("sqlmaint_cat")
      spark.conf.set("spark.sql.catalog.snapm",
        classOf[graft.sources.SnapCatalog].getName)
      spark.conf.set("spark.sql.catalog.snapm.root", b)
      b
    }
  }

  test("OPTIMIZE / VACUUM / DESCRIBE HISTORY parse and run via spark.sql") {
    val base = freshCat()
    spark.sql("CREATE TABLE snapm.db.m (k BIGINT, d BIGINT, p DOUBLE)")
    spark.range(0, 3).collect().foreach(_ => ())
    (0 until 3).foreach { i =>
      spark.sql("INSERT INTO snapm.db.m " +
        s"SELECT id * 3 + $i, (id * 2654435761) % 1000, CAST(id AS DOUBLE) " +
        "FROM range(0, 2000)")
    }
    val before = spark.sql("SELECT * FROM snapm.db.m").count()
    val hist = spark.sql("DESCRIBE HISTORY snapm.db.m")
    assert(hist.columns.toSeq ==
      Seq("version", "op", "n_files", "n_rows", "ts"))
    assert(hist.count() == 4) // create + 3 inserts
    val opt = spark.sql("OPTIMIZE snapm.db.m INTO 2 FILES " +
      "ZORDER BY (k, d)").collect()(0)
    assert(opt.getLong(2) <= opt.getLong(1)) // files_after <= before
    assert(spark.sql("SELECT * FROM snapm.db.m").count() == before)
    // zorder layout: BOTH dimensions prune on the manifest stats
    val dir = s"$base/db/m"
    val (_, kRead, kTot) = SnapTable.readRange(spark, dir, "k", 0, 500)
    val (_, dRead, dTot) = SnapTable.readRange(spark, dir, "d", 0, 100)
    assert(kTot >= 2 && dTot >= 2)
    val removed = spark.sql("VACUUM snapm.db.m RETAIN 1 VERSIONS")
      .collect()(0).getLong(0)
    assert(removed > 0)
    assert(spark.sql("DESCRIBE HISTORY snapm.db.m").count() == 1)
    assert(spark.sql("SELECT * FROM snapm.db.m").count() == before)
  }

  test("TBLPROPERTIES: create/set/unset/show, RESTORE rolls them back, " +
      "and snap.vacuum.retainVersions drives default VACUUM retention") {
    val base = freshCat()
    spark.sql("CREATE TABLE snapm.db.props (k BIGINT) " +
      "TBLPROPERTIES ('team' = 'core', " +
      "'snap.vacuum.retainVersions' = '3')")
    val dir = s"$base/db/props"
    def show(): Map[String, String] =
      spark.sql("SHOW TBLPROPERTIES snapm.db.props").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(show().get("team").contains("core"))
    assert(show().get("snap.vacuum.retainVersions").contains("3"))
    // SET adds/overwrites; UNSET drops — each a metadata-only commit
    spark.sql("ALTER TABLE snapm.db.props SET TBLPROPERTIES " +
      "('team' = 'infra', 'tier' = 'gold')")
    assert(show().get("team").contains("infra"))
    assert(show().get("tier").contains("gold"))
    val vBefore = SnapTable.latestVersion(dir)
    spark.sql("ALTER TABLE snapm.db.props UNSET TBLPROPERTIES ('tier')")
    assert(!show().contains("tier"))
    // properties are part of the snapshot identity: RESTORE brings the
    // dropped key back with the rest of the version
    spark.sql(
      s"RESTORE TABLE snapm.db.props TO VERSION AS OF $vBefore")
    assert(show().get("tier").contains("gold"))
    // a table-declared retention drives a bare VACUUM: 6 inserts, then
    // VACUUM with no RETAIN keeps the last 3 versions readable
    (0 until 6).foreach(i => spark.sql(
      s"INSERT INTO snapm.db.props SELECT id + ${i * 10} " +
        "FROM range(0, 10)"))
    spark.sql("VACUUM snapm.db.props").collect()
    val vs = SnapTable.versions(dir)
    assert(vs.size == 3, s"retention property must keep 3, got $vs")
    assert(SnapTable.readVersion(spark, dir, vs.min).count() ==
      spark.table("snapm.db.props").count() - 20)
  }

  test("SQL CHECK constraints: CREATE TABLE CONSTRAINT, ADD/DROP " +
      "CONSTRAINT, enforcement on insert, and generated columns DDL") {
    val base = freshCat()
    // constraint declared at CREATE TABLE + a generated column
    spark.sql("CREATE TABLE snapm.db.ck (k BIGINT, v BIGINT, " +
      "k2 BIGINT GENERATED ALWAYS AS (k * 2), " +
      "CONSTRAINT v_pos CHECK (v > 0))")
    val dir = s"$base/db/ck"
    val head0 = SnapTable.load(dir, SnapTable.latestVersion(dir))
    assert(head0.checks.get("v_pos").exists(_.contains(">")),
      s"create-time constraint must land in the manifest: ${head0.checks}")
    assert(head0.gen.contains("k2"),
      s"generation expression must land in the manifest: ${head0.gen}")
    // a valid API append computes the absent generated column
    SnapTable.append(spark, dir, spark.range(1, 6)
      .selectExpr("id AS k", "id AS v"))
    assert(spark.table("snapm.db.ck").selectExpr("sum(k2)")
      .head().getLong(0) == 30)
    // enforcement: a violating batch fails, nothing commits
    val vBefore = SnapTable.latestVersion(dir)
    intercept[Exception] {
      SnapTable.append(spark, dir, spark.range(0, 3)
        .selectExpr("id AS k", "id - 5 AS v"))
    }
    assert(SnapTable.latestVersion(dir) == vBefore)
    // ALTER TABLE ADD CONSTRAINT validates existing rows first
    intercept[Exception] {
      spark.sql("ALTER TABLE snapm.db.ck ADD CONSTRAINT v_big " +
        "CHECK (v > 100)")
    }
    spark.sql("ALTER TABLE snapm.db.ck ADD CONSTRAINT v_small " +
      "CHECK (v < 100)")
    assert(SnapTable.load(dir, SnapTable.latestVersion(dir))
      .checks.contains("v_small"))
    // DROP CONSTRAINT lifts enforcement
    spark.sql("ALTER TABLE snapm.db.ck DROP CONSTRAINT v_pos")
    SnapTable.append(spark, dir, spark.range(90, 93)
      .selectExpr("id AS k", "id - 100 AS v")) // v < 0 now fine
    assert(spark.table("snapm.db.ck").count() == 8)
  }

  test("identity columns: GENERATED ALWAYS AS IDENTITY assigns " +
      "monotone values above the manifest high-water mark; ALWAYS " +
      "refuses explicit values, BY DEFAULT accepts them") {
    val base = freshCat()
    spark.sql("CREATE TABLE snapm.db.idt (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 " +
      "INCREMENT BY 2), v STRING)")
    val dir = s"$base/db/idt"
    val head0 = SnapTable.load(dir, SnapTable.latestVersion(dir))
    assert(head0.idents.get("id").contains((10L, 2L, false)),
      s"identity spec must land in the manifest: ${head0.idents}")
    // API append WITHOUT the column: values assigned from START
    SnapTable.append(spark, dir,
      spark.range(3).selectExpr("concat('a', id) AS v"))
    val ids1 = spark.table("snapm.db.idt").select("id")
      .as[Long].collect().toSeq.sorted
    assert(ids1 == Seq(10L, 12L, 14L), s"got $ids1")
    // second batch continues ABOVE the high-water mark (manifest stats)
    SnapTable.append(spark, dir,
      spark.range(2).selectExpr("concat('b', id) AS v"))
    val ids2 = spark.table("snapm.db.idt").select("id")
      .as[Long].collect().toSeq.sorted
    assert(ids2.size == 5 && ids2.distinct.size == 5 &&
      ids2.drop(3).forall(_ > 14L), s"got $ids2")
    assert(ids2.forall(i => (i - 10) % 2 == 0), s"step-aligned: $ids2")
    // ALWAYS: a batch PROVIDING the column is refused
    val e = intercept[Exception] {
      SnapTable.append(spark, dir,
        spark.range(1).selectExpr("99L AS id", "'x' AS v"))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // SQL INSERT omitting the column (Spark pads it NULL) assigns too
    spark.sql("INSERT INTO snapm.db.idt (v) VALUES ('sql1')")
    val sqlId = spark.sql(
      "SELECT id FROM snapm.db.idt WHERE v = 'sql1'").head().getLong(0)
    assert(sqlId > 14 && (sqlId - 10) % 2 == 0, s"got $sqlId")
    spark.sql("DELETE FROM snapm.db.idt WHERE v = 'sql1'")
    // DELETE carries only EXISTING identity values, so it stays legal
    // on a GENERATED ALWAYS table
    spark.sql("DELETE FROM snapm.db.idt WHERE v = 'a0'")
    assert(spark.table("snapm.db.idt").count() == 4)
    // UPDATE carries existing ids through the rewrite — legal, and the
    // touched row keeps its id
    spark.sql("UPDATE snapm.db.idt SET v = 'a1x' WHERE id = 12")
    assert(spark.sql("SELECT v FROM snapm.db.idt WHERE id = 12")
      .head().getString(0) == "a1x")
    // MERGE insert actions can't express column absence: an inserted
    // row leaving the ALWAYS column NULL gets a fresh step-aligned id
    // above the high-water mark; matched rows keep theirs
    spark.sql("""MERGE INTO snapm.db.idt t
      USING (SELECT 'b0' AS mv, 'b0y' AS nv UNION ALL
             SELECT 'zz' AS mv, 'znew' AS nv) s
      ON t.v = s.mv
      WHEN MATCHED THEN UPDATE SET v = s.nv
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (NULL, s.nv)""")
    val after = spark.table("snapm.db.idt")
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(after.values.exists(_ == "b0y") &&
      after.values.exists(_ == "znew"), s"got $after")
    val newId = after.find(_._2 == "znew").get._1
    assert(newId > 14 && (newId - 10) % 2 == 0 &&
      after.keys.toSeq.distinct.size == after.size, s"got $after")
    // BY DEFAULT twin: explicit values accepted AND advance the mark
    spark.sql("CREATE TABLE snapm.db.idd (" +
      "id BIGINT GENERATED BY DEFAULT AS IDENTITY, v STRING)")
    val dir2 = s"$base/db/idd"
    SnapTable.append(spark, dir2,
      spark.range(1).selectExpr("1000L AS id", "'x' AS v"))
    SnapTable.append(spark, dir2,
      spark.range(2).selectExpr("concat('y', id) AS v"))
    val ids3 = spark.table("snapm.db.idd").select("id")
      .as[Long].collect().toSeq.sorted
    assert(ids3.head == 1000L && ids3.tail.forall(_ > 1000L) &&
      ids3.distinct.size == 3, s"got $ids3")
  }

  test("ALTER COLUMN TYPE widens INT->BIGINT and FLOAT->DOUBLE " +
      "metadata-only; mixed files read correctly; bucket refuses") {
    val base = freshCat()
    spark.sql("CREATE TABLE snapm.db.wt (k BIGINT, i INT, f FLOAT)")
    spark.sql("INSERT INTO snapm.db.wt VALUES (1, 10, CAST(1.5 AS FLOAT))," +
      " (2, 20, CAST(2.5 AS FLOAT))")
    val dir = s"$base/db/wt"
    val filesBefore = SnapTable
      .load(dir, SnapTable.latestVersion(dir)).files.map(_.path)
    spark.sql("ALTER TABLE snapm.db.wt ALTER COLUMN i TYPE BIGINT")
    spark.sql("ALTER TABLE snapm.db.wt ALTER COLUMN f TYPE DOUBLE")
    val head = SnapTable.load(dir, SnapTable.latestVersion(dir))
    assert(head.files.map(_.path) == filesBefore,
      "widening must not rewrite any data file")
    assert(SnapTable.schemaOf(head.schemaJson)("i").dataType ==
      org.apache.spark.sql.types.LongType)
    // post-widen writes land wide; mixed files read under one schema
    spark.sql("INSERT INTO snapm.db.wt VALUES " +
      "(3, 3000000000, 3.5)") // a value that needs BIGINT
    val got = spark.sql(
      "SELECT k, i, f FROM snapm.db.wt ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 10L, 1.5), (2L, 20L, 2.5),
      (3L, 3000000000L, 3.5)))
    // narrowing and unrelated changes refuse
    intercept[Exception] {
      spark.sql("ALTER TABLE snapm.db.wt ALTER COLUMN i TYPE INT")
    }
    // the bucket column's hash is type-sensitive: widening it refuses
    val broot = s"$base/db/wb"
    SnapTable.createBucketed(spark, broot,
      spark.range(10).selectExpr("id AS k", "CAST(id AS INT) AS v"),
      "k", "k", 2)
    val e = intercept[Exception] {
      SnapTable.widenColumn(broot, "k",
        org.apache.spark.sql.types.LongType)
    }
    assert(e.getMessage.contains("bucket") ||
      e.getMessage.contains("unsupported"), e.getMessage)
  }

  test("ADD COLUMN DEFAULT doubles as the WRITE default; " +
      "SET/DROP DEFAULT alters the write side, never history") {
    val base = freshCat()
    spark.sql("CREATE TABLE snapm.db.wd (k BIGINT)")
    spark.sql("INSERT INTO snapm.db.wd SELECT id FROM range(0, 3)")
    spark.sql("ALTER TABLE snapm.db.wd ADD COLUMN tier STRING " +
      "DEFAULT 'basic'")
    // initial fill: pre-add rows read the default
    assert(spark.sql("SELECT count(*) FROM snapm.db.wd " +
      "WHERE tier = 'basic'").head().getLong(0) == 3)
    // WRITE default: an INSERT omitting the column resolves it too
    spark.sql("INSERT INTO snapm.db.wd (k) VALUES (100)")
    assert(spark.sql("SELECT tier FROM snapm.db.wd WHERE k = 100")
      .head().getString(0) == "basic")
    // SET DEFAULT changes only the write side...
    spark.sql("ALTER TABLE snapm.db.wd ALTER COLUMN tier " +
      "SET DEFAULT 'pro'")
    spark.sql("INSERT INTO snapm.db.wd (k) VALUES (101)")
    assert(spark.sql("SELECT tier FROM snapm.db.wd WHERE k = 101")
      .head().getString(0) == "pro")
    // ...pre-add history still reads the ORIGINAL initial default
    assert(spark.sql("SELECT count(*) FROM snapm.db.wd " +
      "WHERE k < 3 AND tier = 'basic'").head().getLong(0) == 3)
    // DROP DEFAULT removes the write default from the schema
    spark.sql("ALTER TABLE snapm.db.wd ALTER COLUMN tier DROP DEFAULT")
    val dir = s"$base/db/wd"
    val f = SnapTable.schemaOf(SnapTable.load(dir,
      SnapTable.latestVersion(dir)).schemaJson)("tier")
    assert(!f.metadata.contains("CURRENT_DEFAULT"))
  }

  test("CLUSTER BY: declared clustering drives the write layout " +
      "(both dimensions prune), OPTIMIZE re-materializes it, ALTER " +
      "CLUSTER BY re-points it") {
    val base = freshCat()
    spark.sql("CREATE TABLE snapm.db.cl (k BIGINT, d BIGINT, p DOUBLE) " +
      "CLUSTER BY (k, d)")
    val dir = s"$base/db/cl"
    assert(SnapTable.clusterColumns(dir) == Seq("k", "d"))
    // DDL round-trip: SHOW CREATE TABLE carries the clustering (Spark
    // 4.1 renders the cluster_by transform in the partitioning clause;
    // re-running that DDL routes back through doCreate's cluster_by
    // handling, so the statement round-trips)
    assert(spark.sql("SHOW CREATE TABLE snapm.db.cl").head()
      .getString(0).contains("cluster_by(k, d)"))
    // one INSERT: the write itself morton-clusters the batch, so BOTH
    // dimensions' manifest stats prune immediately — no OPTIMIZE needed
    spark.sql("INSERT INTO snapm.db.cl " +
      "SELECT id, (id * 2654435761) % 1000, CAST(id AS DOUBLE) " +
      "FROM range(0, 8000)")
    val (_, kHit, kTot) = SnapTable.readRange(spark, dir, "k", 0, 999)
    val (_, dHit, dTot) = SnapTable.readRange(spark, dir, "d", 0, 124)
    assert(kTot >= 4 && kHit < kTot,
      s"k must prune on a clustered write: $kHit/$kTot")
    assert(dHit < dTot,
      s"d must prune on a clustered write: $dHit/$dTot")
    // correctness unaffected by the layout
    assert(spark.sql("SELECT count(*) FROM snapm.db.cl " +
      "WHERE d BETWEEN 0 AND 124").head().getLong(0) ==
      spark.range(0, 8000).filter("(id * 2654435761) % 1000 <= 124")
        .count())
    // a bare OPTIMIZE re-clusters BY THE DECLARED COLUMNS
    spark.sql("OPTIMIZE snapm.db.cl INTO 4 FILES").collect()
    val (_, kHit2, kTot2) = SnapTable.readRange(spark, dir, "k", 0, 999)
    assert(kTot2 == 4 && kHit2 < kTot2,
      s"post-OPTIMIZE k pruning: $kHit2/$kTot2")
    // ALTER re-points; dropping a cluster column refuses
    spark.sql("ALTER TABLE snapm.db.cl CLUSTER BY (d)")
    assert(SnapTable.clusterColumns(dir) == Seq("d"))
    intercept[Exception] {
      spark.sql("ALTER TABLE snapm.db.cl DROP COLUMN d")
    }
    spark.sql("OPTIMIZE snapm.db.cl INTO 4 FILES").collect()
    val (_, dHit3, dTot3) = SnapTable.readRange(spark, dir, "d", 0, 124)
    assert(dTot3 == 4 && dHit3 == 1,
      s"single-column recluster must range-pack d: $dHit3/$dTot3")
  }

  test("VACUUM RETAIN n HOURS keeps every version inside the window") {
    val base = freshCat()
    spark.sql("CREATE TABLE snapm.db.vh (k BIGINT)")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO snapm.db.vh SELECT id + ${i * 10} FROM range(0, 5)"))
    val dir = s"$base/db/vh"
    // everything was committed seconds ago: a 1-hour window keeps all
    val removed = spark.sql("VACUUM snapm.db.vh RETAIN 1 HOURS")
      .head().getLong(0)
    assert(removed == 0, s"nothing is outside the window, removed $removed")
    assert(SnapTable.versions(dir).size == 4)
    // and the version form still reclaims (sanity that HOURS did gate)
    spark.sql("VACUUM snapm.db.vh RETAIN 1 VERSIONS").collect()
    assert(SnapTable.versions(dir).size == 1)
  }

  test("snap_changes / snap_changes_delta TVFs: CDC from plain SQL") {
    val base = freshCat()
    spark.sql("CREATE TABLE snapm.db.cdc (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO snapm.db.cdc SELECT id, id * 10 " +
      "FROM range(0, 10)")                                   // v2
    spark.sql("DELETE FROM snapm.db.cdc WHERE k < 3")        // v3
    // classified: keyed insert/update/delete actions with images
    val ch = spark.sql(
      "SELECT action, k, v FROM snap_changes('snapm.db.cdc', 'k', 2, 3) " +
        "ORDER BY k").collect()
    assert(ch.forall(_.getString(0) == "delete") && ch.length == 3,
      s"got ${ch.mkString(",")}")
    assert(ch.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    // signed: deltas net to the live table under a linear aggregate
    val net = spark.sql(
      "SELECT sum(v * _sign) FROM snap_changes_delta('snapm.db.cdc', 1, 3)")
      .head().getLong(0)
    assert(net == spark.sql("SELECT sum(v) FROM snapm.db.cdc")
      .head().getLong(0), "signed deltas must net to the live sum")
    // queryable history: the commit log as a filterable relation
    assert(spark.sql("SELECT version FROM snap_history('snapm.db.cdc') " +
      "WHERE op = 'delete'").head().getLong(0) == 3L)
  }

  test("DESCRIBE DETAIL reports head-snapshot metadata") {
    freshCat()
    spark.sql("CREATE TABLE snapm.db.det (k BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO snapm.db.det SELECT id FROM range(0, 100)")
    val d = spark.sql("DESCRIBE DETAIL snapm.db.det").collect()(0)
    assert(d.getLong(1) == 2) // version
    assert(d.getLong(4) == 100) // n_rows
    assert(d.getLong(5) > 0) // size_bytes
    assert(d.getString(6) == "k") // partition_spec
  }

  test("CREATE BLOOM INDEX builds the sidecar and DETAIL reports it") {
    freshCat()
    spark.sql("CREATE TABLE snapm.db.bx (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO snapm.db.bx " +
      "SELECT id, (id * 2654435761) % 5000 FROM range(0, 5000)")
    val r = spark.sql("CREATE BLOOM INDEX ON snapm.db.bx (v)")
      .collect()(0)
    assert(r.getLong(1) > 0) // indexed_files
    val d = spark.sql("DESCRIBE DETAIL snapm.db.bx").collect()(0)
    assert(d.getLong(9) == 1) // n_bloom_indexes
  }

  test("regular SQL still parses through the delegate") {
    assert(spark.sql("SELECT 1 + 1 AS two").collect()(0).getInt(0) == 2)
    intercept[Exception] { // genuinely bad SQL still errors
      spark.sql("OPTIMIZE") // incomplete: falls through to the delegate
    }
  }

  test("maintenance verbs refuse non-snap catalogs") {
    freshCat()
    val e = intercept[IllegalArgumentException] {
      spark.sql("VACUUM spark_catalog.db.t RETAIN 1 VERSIONS").collect()
    }
    assert(e.getMessage.contains("not a snap catalog"))
  }

  test("CONVERT TO SNAP (quoted-path form) adopts a raw dir; SHALLOW " +
      "CLONE VERSION AS OF pins the forked snapshot") {
    freshCat()
    // quoted-path convert: a raw parquet dir OUTSIDE any warehouse
    val raw = Tmp.dir("sqlconv_raw")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v")
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(raw)
    val res = spark.sql(
      s"CONVERT TO SNAP '$raw' STATS COLUMN k").collect()(0)
    assert(res.getLong(0) == 1 && res.getLong(2) == 100)
    assert(SnapTable.read(spark, raw).count() == 100)
    // clone AS OF: fork v1, not the head
    spark.sql("CREATE TABLE snapm.db.csrc (k BIGINT)")
    spark.sql("INSERT INTO snapm.db.csrc SELECT id FROM range(0, 10)")
    spark.sql("INSERT INTO snapm.db.csrc SELECT id FROM range(10, 30)")
    spark.sql("CREATE TABLE snapm.db.cdst SHALLOW CLONE snapm.db.csrc " +
      "VERSION AS OF 2")
    assert(spark.table("snapm.db.cdst").count() == 10,
      "clone must pin the AS OF version's snapshot")
    assert(spark.table("snapm.db.csrc").count() == 30)
    // plain CREATE TABLE still delegates to Spark's parser
    spark.sql("CREATE TABLE snapm.db.plainct (k BIGINT)")
    assert(spark.table("snapm.db.plainct").count() == 0)
  }

  test("runStatement routes the same commands without the parser") {
    freshCat()
    spark.sql("CREATE TABLE snapm.db.rs (k BIGINT)")
    spark.sql("INSERT INTO snapm.db.rs SELECT id FROM range(0, 10)")
    val h = graft.sources.SnapSqlParser.runStatement(spark,
      "DESCRIBE HISTORY snapm.db.rs")
    assert(h.count() == 2)
    // non-maintenance SQL passes through to spark.sql
    assert(graft.sources.SnapSqlParser.runStatement(spark,
      "SELECT 41 + 1 AS v").collect()(0).getInt(0) == 42)
  }
}
