package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{SnapCatalog, SnapTable}

/** Persistent snap-catalog views: DSv2 ViewCatalog storage + the
  * parser-extension DDL verbs + the injected substitution rule (OSS
  * Spark has the ViewCatalog API but no analyzer wiring — graft ships
  * its own).
  */
class SqlViewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val base: String = {
    val b = Tmp.dir("sqlview_spec")
    spark.conf.set("spark.sql.catalog.svw", classOf[SnapCatalog].getName)
    spark.conf.set("spark.sql.catalog.svw.root", b)
    b
  }

  test("CREATE VIEW / query / SHOW VIEWS / DROP round trip") {
    SnapTable.create(spark, s"$base/db/t",
      spark.range(100).selectExpr("id AS k", "id * 2 AS v"), "k")
    spark.sql("CREATE VIEW svw.db.big AS " +
      "SELECT k, v FROM svw.db.t WHERE v >= 100")
    val got = spark.sql("SELECT count(*) FROM svw.db.big")
      .head().getLong(0)
    assert(got == 50)
    // composes with ordinary SQL (joins back to the base table) and
    // with spark.table
    val j = spark.sql("SELECT count(*) FROM svw.db.big b " +
      "JOIN svw.db.t t ON b.k = t.k").head().getLong(0)
    assert(j == 50)
    assert(spark.table("svw.db.big").count() == 50)
    val views = spark.sql("SHOW VIEWS IN svw.db").collect()
      .map(_.getString(1))
    assert(views.contains("big"))
    // a view file is plain warehouse metadata on disk
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(base, "db", "_views", "big.json")))
    spark.sql("DROP VIEW svw.db.big")
    intercept[Exception] { spark.sql("SELECT * FROM svw.db.big") }
    // IF EXISTS swallows the second drop
    spark.sql("DROP VIEW IF EXISTS svw.db.big")
  }

  test("OR REPLACE redefines; view reads see LIVE base-table data") {
    SnapTable.create(spark, s"$base/db/t2",
      spark.range(10).selectExpr("id AS k"), "k")
    spark.sql("CREATE VIEW svw.db.r AS SELECT k FROM svw.db.t2 " +
      "WHERE k < 3")
    assert(spark.table("svw.db.r").count() == 3)
    spark.sql("CREATE OR REPLACE VIEW svw.db.r AS " +
      "SELECT k FROM svw.db.t2 WHERE k < 7")
    assert(spark.table("svw.db.r").count() == 7)
    // views are text substitution: a base-table append shows through
    SnapTable.append(spark, s"$base/db/t2",
      spark.range(2).selectExpr("id AS k"))
    assert(spark.table("svw.db.r").count() == 9)
    spark.sql("DROP VIEW svw.db.r")
  }

  test("views nest, can't shadow tables, cycles are refused; catalog " +
      "API covers ALTER/RENAME") {
    SnapTable.create(spark, s"$base/db/t3",
      spark.range(50).selectExpr("id AS k", "CAST(id AS DOUBLE) AS x"),
      "k")
    spark.sql("CREATE VIEW svw.db.l1 AS " +
      "SELECT k, x FROM svw.db.t3 WHERE k % 2 = 0")
    spark.sql("CREATE VIEW svw.db.l2 AS " +
      "SELECT sum(x) AS sx, count(*) AS n FROM svw.db.l1")
    assert(spark.sql("SELECT n FROM svw.db.l2").as[Long].head() == 25)
    // a CREATE VIEW with a TABLE's name is refused
    intercept[Exception] {
      spark.sql("CREATE VIEW svw.db.t3 AS SELECT 1 AS one")
    }
    // self-reference is detected, not an infinite expansion
    spark.sql("CREATE OR REPLACE VIEW svw.db.l2 AS " +
      "SELECT * FROM svw.db.l2")
    val e = intercept[Exception] { spark.table("svw.db.l2").collect() }
    assert(e.getMessage.contains("cyclic"), e.getMessage)
    // ALTER (properties) and RENAME through the ViewCatalog API
    val cat = spark.sessionState.catalogManager.catalog("svw")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
    val id1 = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "l1")
    cat.alterView(id1,
      org.apache.spark.sql.connector.catalog.ViewChange
        .setProperty("team", "rc"))
    assert(cat.loadView(id1).properties().get("team") == "rc")
    cat.alterView(id1,
      org.apache.spark.sql.connector.catalog.ViewChange
        .removeProperty("team"))
    assert(!cat.loadView(id1).properties().containsKey("team"))
    val id1b = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "l1renamed")
    cat.renameView(id1, id1b)
    assert(spark.table("svw.db.l1renamed").count() == 25)
    assert(cat.listViews("db").map(_.name()).contains("l1renamed"))
    spark.sql("DROP VIEW svw.db.l2")
    spark.sql("DROP VIEW svw.db.l1renamed")
  }

  test("CREATE VIEW rejects a command/DML body instead of executing it") {
    SnapTable.create(spark, s"$base/db/vt",
      spark.range(10).selectExpr("id AS k", "id AS v"), "k")
    val before = SnapTable.latestVersion(s"$base/db/vt")
    // an INSERT body must neither run nor be stored
    intercept[Exception] {
      spark.sql("CREATE VIEW svw.db.evil AS " +
        "INSERT INTO svw.db.vt SELECT 99 AS k, 99 AS v")
    }
    assert(SnapTable.latestVersion(s"$base/db/vt") == before,
      "CREATE VIEW must not execute the body: no commit may land")
    assert(spark.table("svw.db.vt").count() == 10)
    // a maintenance CALL body must not run either
    intercept[Exception] {
      spark.sql("CREATE VIEW svw.db.evil2 AS " +
        "CALL svw.system.compact('db.vt')")
    }
    assert(SnapTable.latestVersion(s"$base/db/vt") == before)
    val views = spark.sql("SHOW VIEWS IN svw.db").collect()
      .map(_.getString(1))
    assert(!views.contains("evil") && !views.contains("evil2"))
  }
}
