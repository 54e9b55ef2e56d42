package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.SnapTable

/** Model-based check of the table format: a seeded random walk of table
  * operations (append / merge / deleteWhere / compact / restore / vacuum)
  * runs against both the real SnapTable and an in-memory Map model; after
  * EVERY step the full table contents must equal the model. This is the
  * test that catches cross-verb interaction bugs no single-verb spec sees
  * (e.g. merge after restore, compact after delete).
  */
class SnapTableModelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("random op walk: table contents always equal the model") {
    val rnd = new scala.util.Random(42)
    val root = Tmp.dir("snaptab_model")
    import spark.implicits._

    def df(m: Map[Long, Long]) =
      m.toSeq.sortBy(_._1).toDF("k", "v")
        .repartitionByRange(4, col("k"))

    var model: Map[Long, Long] =
      (1L to 200L).map(k => k -> (k * 7)).toMap
    SnapTable.create(spark, root, df(model), "k")
    // model history for restore: version -> state
    var history = Map(1 -> model)
    var lastRestorable = 1

    def readState(): Map[Long, Long] =
      SnapTable.read(spark, root).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    for (step <- 1 to 14) {
      val op = rnd.nextInt(6)
      op match {
        case 0 => // append fresh keys
          val base = 1000L * step
          val add = (base to base + 30L).map(k => k -> (k * 3)).toMap
          val v = SnapTable.append(spark, root, df(add))
          model = model ++ add
          history += v -> model
        case 1 => // merge: update a slice, insert a few, delete a few
          val upd = model.keys.filter(_ % 7 == step % 7).take(20)
            .map(k => (k, k * 100, false)).toSeq
          val ins = Seq((5000L + step, 1L, false))
          val del = model.keys.filter(_ % 11 == step % 11).take(5)
            .map(k => (k, 0L, true)).toSeq
          val updates = (upd ++ ins ++ del)
            .toDF("k", "v", "_del")
          val v = SnapTable.merge(spark, root, updates, "k", Some("_del"))
          model = model -- del.map(_._1) ++
            upd.map(t => t._1 -> t._2) ++ ins.map(t => t._1 -> t._2)
          history += v -> model
        case 2 => // deleteWhere
          val m = 3 + rnd.nextInt(5)
          val v = SnapTable.deleteWhere(spark, root, col("k") % m === 1)
          model = model.filter { case (k, _) => k % m != 1 }
          history += v -> model
        case 3 => // compact (content no-op)
          val v = SnapTable.compact(spark, root, targetFiles = 3)
          history += v -> model
        case 4 => // restore to a random known version
          val target = history.keys.toSeq.sorted
            .apply(rnd.nextInt(history.size))
          val v = SnapTable.restore(spark, root, target)
          model = history(target)
          history += v -> model
        case 5 => // vacuum keeps only the live snapshot
          SnapTable.vacuum(root, retainVersions = 1)
          val live = SnapTable.latestVersion(root)
          history = Map(live -> model)
      }
      assert(readState() == model,
        s"state diverged at step $step (op $op)")
      lastRestorable = SnapTable.latestVersion(root)
    }
  }
}
