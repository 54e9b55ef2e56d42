package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{GraftBucketFunction, SnapCatalog, SnapTable}

/** Storage-partitioned joins: the bucket-layout physical contracts the
  * SQL results can't show — one bucket id per data file, the manifest
  * round-trip of the layout, the bucket function's hash identity with the
  * write path, and the headline claim: a join of two co-bucketed tables
  * plans with ZERO shuffle exchanges on the scan sides.
  */
class SpjSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val base: String = {
    val b = Tmp.dir("spj_spec")
    spark.conf.set("spark.sql.catalog.spjt", classOf[SnapCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjt.root", b)
    b
  }

  private def withSpjConf[A](f: => A): A = {
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k =>
      k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucket write: one bucket id per file, manifest round-trips layout") {
    val root = s"$base/db/orders_b"
    val df = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    SnapTable.createBucketed(spark, root, df, "o_orderkey",
      "o_custkey", 8)
    val snap = SnapTable.load(root, 1)
    assert(snap.bucket.contains(("o_custkey", 8)))
    assert(snap.files.nonEmpty)
    // every file carries a single-bucket [id,id] stats entry
    snap.files.foreach { f =>
      val (lo, hi) = f.stats(SnapTable.BucketStatsCol)
      assert(lo == hi && lo >= 0 && lo < 8, s"${f.path}: [$lo,$hi]")
    }
    // the write hash is pmod(hash(col), n) — rows really are in the
    // bucket their file claims
    val byBucket = spark.read.schema(df.schema)
      .parquet(snap.files.map(f => s"$root/${f.path}"): _*)
    assert(byBucket.count() == df.count())
    val expect = df.groupBy(pmod(hash(col("o_custkey")), lit(8)).as("b"))
      .count().orderBy("b").collect().map(r => r.getInt(0) -> r.getLong(1))
    val got = snap.files.groupBy(_.stats(SnapTable.BucketStatsCol)._1)
      .map { case (id, fs) => id.toInt -> fs.map(_.rows).sum }
      .toSeq.sortBy(_._1)
    assert(got == expect.toSeq)
  }

  test("bucket function matches the write-path hash") {
    val rows = spark.range(1000).selectExpr("id * 7919 AS v")
      .withColumn("h", pmod(hash(col("v")), lit(16)))
      .collect()
    rows.foreach { r =>
      assert(GraftBucketFunction.bucketId(r.getLong(0), 16) == r.getInt(1))
    }
  }

  test("co-bucketed join plans with zero shuffles (storage-partitioned)") {
    withSpjConf {
      val o = T(spark, TestSpark.Sf, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val c = T(spark, TestSpark.Sf, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      SnapTable.createBucketed(spark, s"$base/db/o8", o, "o_orderkey",
        "o_custkey", 8)
      SnapTable.createBucketed(spark, s"$base/db/c8", c, "c_custkey",
        "c_custkey", 8)
      val joined = spark.sql(
        """SELECT o.o_orderkey, o.o_totalprice, c.c_name
          |FROM spjt.db.o8 o JOIN spjt.db.c8 c
          |  ON o.o_custkey = c.c_custkey""".stripMargin)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join must not shuffle either side:\n$plan")
      // and it is CORRECT: same result as the plain parquet join
      val expect = o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "o_totalprice", "c_name")
      assert(joined.count() == expect.count())
      assert(joined.exceptAll(expect).isEmpty &&
        expect.exceptAll(joined).isEmpty)
    }
  }

  test("one-file-per-bucket tables report ordering: the SPJ plans " +
      "SortMergeJoin with ZERO SortExec; an append revokes the claim") {
    withSpjConf {
      val o = T(spark, TestSpark.Sf, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val c = T(spark, TestSpark.Sf, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      SnapTable.createBucketed(spark, s"$base/db/os8", o, "o_orderkey",
        "o_custkey", 8)
      SnapTable.createBucketed(spark, s"$base/db/cs8", c, "c_custkey",
        "c_custkey", 8)
      def planOf() = spark.sql(
        """SELECT o.o_orderkey, o.o_totalprice, c.c_name
          |FROM spjt.db.os8 o JOIN spjt.db.cs8 c
          |  ON o.o_custkey = c.c_custkey""".stripMargin)
      val joined = planOf()
      val exec = joined.queryExecution.executedPlan
      assert(exec.toString.contains("SortMergeJoin"))
      assert(!exec.toString.contains("Exchange"))
      val sorts = exec.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sorts.isEmpty,
        s"write-path bucket sort must satisfy the SMJ ordering:\n$exec")
      // correctness unchanged
      val expect = o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "o_totalprice", "c_name")
      assert(joined.exceptAll(expect).isEmpty &&
        expect.exceptAll(joined).isEmpty)
      // an append makes a bucket group multi-file: files are each
      // sorted but overlap, so the scan must STOP claiming ordering
      // and the SMJ re-sorts (correctness over optimism)
      SnapTable.append(spark, s"$base/db/cs8", c.limit(50))
      val joined2 = planOf()
      val sorts2 = joined2.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sorts2.nonEmpty,
        "multi-file bucket groups must not claim ordering")
      assert(joined2.count() == expect.count() + c.limit(50)
        .join(o, col("c_custkey") === col("o_custkey")).count())
    }
  }

  test("manifest statistics let the planner auto-broadcast a small " +
      "bucketed table — no hint") {
    // default autoBroadcastJoinThreshold (10 MB) stays ON here: the
    // whole point is that the planner CHOOSES broadcast from the
    // manifest-derived scan statistics, which defaultSizeInBytes
    // (effectively infinite) would never allow
    val saved = Seq("spark.sql.adaptive.enabled").map(k =>
      k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val big = T(spark, TestSpark.Sf, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val dim = spark.range(0, 25).selectExpr("id AS c_custkey",
        "concat('cust#', id) AS c_tier")
      SnapTable.createBucketed(spark, s"$base/db/statbig", big,
        "o_orderkey", "o_custkey", 8)
      SnapTable.createBucketed(spark, s"$base/db/statdim", dim,
        "c_custkey", "c_custkey", 8)
      val j = spark.sql(
        """SELECT b.o_orderkey, d.c_tier
          |FROM spjt.db.statbig b JOIN spjt.db.statdim d
          |  ON b.o_custkey = d.c_custkey""".stripMargin)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"KB-scale bucketed dim was not auto-broadcast:\n$plan")
      assert(j.count() ==
        big.join(dim.withColumnRenamed("c_custkey", "ck"),
          col("o_custkey") === col("ck")).count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("merge-on-read deletes ride the native scan: SPJ survives and " +
      "counts stay exact") {
    withSpjConf {
      val root = s"$base/db/dvb"
      SnapTable.createBucketed(spark, root,
        spark.range(400).selectExpr("id AS k", "id * 3 AS v"),
        "k", "k", 4)
      SnapTable.deleteWhereMoR(spark, root, col("k") < 50)
      assert(spark.sql("SELECT * FROM spjt.db.dvb").count() == 350)
      // a DV subtraction never moves a row between buckets, so the
      // co-bucketed self-join still plans with zero exchanges
      val j = spark.sql(
        """SELECT a.k FROM spjt.db.dvb a JOIN spjt.db.dvb b
          |  ON a.k = b.k""".stripMargin)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() == 350)
      assert(spark.sql(
        "SELECT min(k) FROM spjt.db.dvb").head().getLong(0) == 50L)
    }
  }

  test("appends preserve the bucket layout; mixed-version table still SPJs") {
    withSpjConf {
      val df = spark.range(500)
        .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      val root = s"$base/db/appendb"
      SnapTable.createBucketed(spark, root,
        df.filter(col("k") < 250), "k", "k", 4)
      SnapTable.append(spark, root, df.filter(col("k") >= 250))
      val snap = SnapTable.load(root, 2)
      snap.files.foreach { f =>
        val (lo, hi) = f.stats(SnapTable.BucketStatsCol)
        assert(lo == hi, s"${f.path} spans buckets [$lo,$hi]")
      }
      assert(spark.sql("SELECT * FROM spjt.db.appendb").count() == 500)
      // self-join on the bucket key: zero exchanges
      val j = spark.sql(
        """SELECT a.k FROM spjt.db.appendb a JOIN spjt.db.appendb b
          |  ON a.k = b.k""".stripMargin)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() == 500)
    }
  }
}
