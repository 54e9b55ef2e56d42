package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapTable

/** REAL multi-threaded commit races (the unit specs simulate races
  * sequentially; this drives them live): concurrent appenders,
  * duplicate txn redelivery, and transforming writers retrying
  * through `ConcurrentCommitException` must converge to exactly the
  * state the operations imply — no lost updates, no duplicated
  * batches, no torn manifests. The link(2) create-exclusive commit is
  * the entire concurrency story, so this is the spec that earns it.
  */
class ConcurrencySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("16 threads of appendOnce + redelivery + retrying deleteWhere " +
      "converge with no lost updates and a loadable history") {
    val root = Tmp.dir("conc_spec")
    SnapTable.create(spark, root,
      spark.range(100).selectExpr("id AS k"), "k")
    val appenders = 12
    val batches = 3
    val batchRows = 50
    val pool = Executors.newFixedThreadPool(16)
    val start = new CountDownLatch(1)
    val failures = new AtomicInteger(0)
    val retries = new AtomicInteger(0)
    def submit(body: => Unit): Unit = {
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try body
          catch { case t: Throwable =>
            failures.incrementAndGet(); t.printStackTrace()
          }
        }
      })
      ()
    }
    // appenders write DISJOINT key ranges >= 1000, each batch under an
    // idempotency txn; thread 0 REDELIVERS its first txn (crash-retry)
    (0 until appenders).foreach { t =>
      submit {
        (0 until batches).foreach { b =>
          val lo = 1000L + (t * batches + b) * batchRows
          val txn = s"conc:$t:$b"
          SnapTable.appendOnce(spark, root,
            spark.range(lo, lo + batchRows).selectExpr("id AS k"), txn)
          if (t == 0 && b == 0)
            SnapTable.appendOnce(spark, root, // duplicate delivery
              spark.range(lo, lo + batchRows).selectExpr("id AS k"), txn)
        }
      }
    }
    // transformers erase the ORIGINAL keys (< 100); appends never
    // re-add them, so the converged state is deterministic. Lost
    // commit races retry, like any production writer.
    (0 until 4).foreach { _ =>
      submit {
        var done = false
        var attempts = 0
        while (!done && attempts < 60) {
          attempts += 1
          try {
            SnapTable.deleteWhere(spark, root, col("k") < 100)
            done = true
          } catch {
            case _: SnapTable.ConcurrentCommitException =>
              retries.incrementAndGet()
          }
        }
        require(done, "transformer starved out after 60 attempts")
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "pool timeout")
    assert(failures.get() == 0, s"${failures.get()} thread(s) failed")
    // converged contents: every appended batch exactly once, the
    // redelivered txn once, every original key erased
    val got = SnapTable.read(spark, root)
    assert(got.filter(col("k") < 100).count() == 0,
      "original keys must be erased")
    assert(got.count() == appenders.toLong * batches * batchRows,
      "lost or duplicated appended batches")
    assert(got.select(countDistinct(col("k"))).head().getLong(0) ==
      appenders.toLong * batches * batchRows, "duplicated keys")
    // the whole history is loadable (no torn manifests) and vacuum
    // leaves the live snapshot byte-identical
    SnapTable.versions(root).foreach(v => SnapTable.load(root, v))
    val before = got.orderBy("k").collect().toSeq
    SnapTable.vacuum(root, retainVersions = 1)
    assert(SnapTable.read(spark, root).orderBy("k").collect().toSeq
      == before)
    // at least one real race happened, or the spec proved nothing —
    // 36 append commits + 4 transformers over one head make this
    // overwhelmingly likely; if it ever flakes, raise the thread count
    assert(retries.get() > 0,
      "no commit race was exercised — increase contention")
  }

  test("concurrent appends to a GENERATED ALWAYS identity table never " +
      "duplicate values (race detection re-assigns, not relinks)") {
    val root = Tmp.dir("conc_ident")
    SnapTable.createEmpty(root,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))),
      "id", idents = Map("id" -> (1L, 1L, false)))
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val failures = new AtomicInteger(0)
    (0 until 8).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try (0 until 3).foreach { b =>
            SnapTable.append(spark, root,
              spark.range(40).selectExpr(s"id + ${t * 1000 + b} AS v"))
          } catch { case x: Throwable =>
            failures.incrementAndGet(); x.printStackTrace()
          }
        }
      })
      ()
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "pool timeout")
    assert(failures.get() == 0, s"${failures.get()} thread(s) failed")
    val got = SnapTable.read(spark, root)
    assert(got.count() == 8L * 3 * 40)
    assert(got.select(countDistinct(col("id"))).head().getLong(0) ==
      8L * 3 * 40, "duplicate identity values under concurrency")
  }
}
