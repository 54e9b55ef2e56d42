package graft

import graft.sources.ParquetMeta
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two properties the ANN sizing path relies on
  * (VERDICT-r10 #3): ParquetMeta.rowCount equals the scan-based count,
  * and computing it schedules ZERO Spark jobs — the op's first job is
  * the pipeline itself, never a sizing pass.
  */
class ParquetMetaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("footer rowCount equals df.count() on single-file fixtures") {
    for (t <- Seq("embeddings", "documents", "nation")) {
      val expect = spark.read.parquet(s"${TestSpark.Sf}/$t.parquet").count()
      assert(ParquetMeta.rowCount(spark, s"${TestSpark.Sf}/$t.parquet")
        === expect, t)
      assert(T.rows(spark, TestSpark.Sf, t) === expect, t)
    }
  }

  test("footer rowCount sums a partitioned multi-file directory") {
    val dir = Tmp.dir("pqmeta_part")
    spark.range(0, 1000)
      .selectExpr("id", "id % 7 AS p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    assert(ParquetMeta.rowCount(spark, dir) === 1000L)
    // stale committer debris (a parquet file under a _temporary/ or
    // .hidden/ subdir) must not inflate the count — filtering is by
    // path component, like Spark's own file index
    val tmp = new java.io.File(s"$dir/_temporary/0")
    tmp.mkdirs()
    spark.range(0, 50).coalesce(1).write
      .parquet(s"$dir/_temporary/0/attempt")
    val hid = new java.io.File(s"$dir/.staging")
    hid.mkdirs()
    spark.range(0, 30).coalesce(1).write.parquet(s"$dir/.staging/x")
    assert(ParquetMeta.rowCount(spark, dir) === 1000L,
      "hidden-subdir parquet files leaked into the count")
  }

  test("longStats equals scan-based min/max and proves id density") {
    import org.apache.spark.sql.functions._
    for (t <- Seq("embeddings", "documents")) {
      val idCol = if (t == "embeddings") "vec_id" else "doc_id"
      val df = spark.read.parquet(s"${TestSpark.Sf}/$t.parquet")
      val r = df.agg(min(idCol), max(idCol)).first()
      assert(ParquetMeta.longStats(spark, s"${TestSpark.Sf}/$t.parquet",
        idCol) === ((r.getLong(0), r.getLong(1))), t)
    }
    // the density derivation the incremental IVF sizing relies on:
    // n rows spanning exactly [0, n-1] with zero Spark jobs
    val n = ParquetMeta.rowCount(spark, s"${TestSpark.Sf}/embeddings.parquet")
    val (lo, hi) = ParquetMeta.longStats(spark,
      s"${TestSpark.Sf}/embeddings.parquet", "vec_id")
    assert(lo === 0L && hi === n - 1)
  }

  test("longStats spans multi-file partitioned layouts; unknown column fails") {
    val dir = Tmp.dir("pqmeta_stats_part")
    spark.range(5, 505)
      .selectExpr("id", "id % 7 AS p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    assert(ParquetMeta.longStats(spark, dir, "id") === ((5L, 504L)))
    val e = intercept[IllegalArgumentException] {
      ParquetMeta.longStats(spark, dir, "nope")
    }
    assert(e.getMessage.contains("no column"))
  }

  test("longStats schedules zero Spark jobs") {
    val group = "pqmeta-stats-zero-jobs"
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (j.properties != null &&
          group == j.properties.getProperty("spark.jobGroup.id"))
          jobs.add(j.jobId)
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(group, "zero-jobs pin")
    try {
      ParquetMeta.longStats(spark,
        s"${TestSpark.Sf}/embeddings.parquet", "vec_id")
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (jobs.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(jobs.size === 1,
        s"expected only the sentinel job, saw ${jobs.size}")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
  }

  test("rowCount refuses a visible non-parquet data file (ADVICE-r11)") {
    val dir = Tmp.dir("pqmeta_mixed")
    spark.range(0, 100).write.mode("overwrite").parquet(dir)
    // a non-Spark writer's suffix-less data file: silently skipping it
    // would undercount and skew IVF sizing with no error
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data-0001.orc"), "not parquet")
    val e = intercept[IllegalArgumentException] {
      ParquetMeta.rowCount(spark, dir)
    }
    assert(e.getMessage.contains("non-parquet data file"))
  }

  test("rowCount schedules zero Spark jobs") {
    val group = "pqmeta-zero-jobs"
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        // group-scope the count: late-arriving bus events from earlier
        // suites/tests must not leak into this assertion
        if (j.properties != null &&
          group == j.properties.getProperty("spark.jobGroup.id"))
          jobs.add(j.jobId)
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(group, "zero-jobs pin")
    try {
      ParquetMeta.rowCount(spark, s"${TestSpark.Sf}/embeddings.parquet")
      // sentinel action (a bare RDD count = exactly ONE job; an AQE
      // DataFrame action can run several): the listener bus is FIFO, so
      // once the sentinel's job arrives, any job rowCount had scheduled
      // would already be here
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (jobs.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(jobs.size === 1,
        s"expected only the sentinel job, saw ${jobs.size}")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
  }
}
