package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave-18 semantics vs in-memory recomputes. */
class Wave18Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("join_asof_tolerance: the bound only REMOVES matches vs the " +
      "unbounded as-of, and removed means stale") {
    val bounded = SparkEntry.queries("join_asof_tolerance")(
      spark, TestSpark.Sf).collect()
      .map(r => r.getLong(1) -> (Option(r.getAs[Any]("click_ts")),
        r.getBoolean(4))).toMap
    val unbounded = SparkEntry.queries("join_asof")(spark, TestSpark.Sf)
      .collect()
      .map(r => r.getLong(1) ->
        Option(r.getAs[java.time.LocalDateTime]("click_ts"))).toMap
    assert(bounded.keySet == unbounded.keySet, "same purchase facts")
    bounded.foreach { case (id, (ct, attributed)) =>
      if (attributed) {
        // a fresh match must be the SAME click the unbounded join found
        assert(ct.isDefined && unbounded(id).isDefined)
        val b = ct.get.asInstanceOf[java.time.LocalDateTime]
        assert(b == unbounded(id).get, s"purchase $id")
      } else {
        assert(ct.isEmpty, s"stale match must be NULL, purchase $id")
      }
    }
    // the tolerance must actually bite somewhere AND pass somewhere
    val flags = bounded.values.map(_._2).toSet
    assert(flags == Set(true, false),
      "30-minute bound should split the purchases at this scale")
  }

  test("text_novelty_ratio: bounds, first-document novelty, recompute") {
    val got = SparkEntry.queries("text_novelty_ratio")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (d, n, nov) =>
      assert(n > 0 && nov >= 0.0 && nov <= 1.0, s"doc $d")
    }
    assert(got.minBy(_._1)._3 == 1.0,
      "the earliest document is 100% novel by construction")
    // recompute one mid-corpus document directly
    val docs = T(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val firstSeen = scala.collection.mutable.Map.empty[Seq[String], Long]
    docs.sortBy(_._1).foreach { case (id, tk) =>
      tk.sliding(3).filter(_.size == 3).foreach { sh =>
        if (!firstSeen.contains(sh)) firstSeen(sh) = id
      }
    }
    val probe = got(got.length / 2)._1
    val shs = docs.find(_._1 == probe).get._2.sliding(3)
      .filter(_.size == 3).toSeq.distinct
    val novel = shs.count(sh => firstSeen(sh) == probe)
    val expect = math.round(novel.toDouble / shs.size * 1e6) / 1e6
    assert(math.abs(got.find(_._1 == probe).get._3 - expect) < 1e-9)
  }

  test("win_reset_running_sum: the sum restarts after each purchase") {
    val got = SparkEntry.queries("win_reset_running_sum")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.nonEmpty)
    val events = T(spark, TestSpark.Sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime]("ts"), r.getString(3),
        r.getLong(4)))
    val probe = got.groupBy(_._1).maxBy(_._2.size)._1
    val mine = events.filter(_._1 == probe)
      .sortBy(t => (t._3, t._2))
    var seg = 0L; var run = 0L
    val expect = mine.map { case (_, id, _, tpe, cents) =>
      run += cents
      val row = (id, seg, math.round(run.toDouble) / 100.0)
      if (tpe == "purchase") { seg += 1; run = 0 }
      row
    }
    val gotUser = got.filter(_._1 == probe)
      .map(t => (t._2, t._3, t._4)).toSeq
    expect.zip(gotUser).foreach { case ((id, s, v), (gid, gs, gv)) =>
      assert(id == gid && s == gs && math.abs(v - gv) < 1e-6,
        s"user $probe event $id")
    }
    // segments > 0 exist (resets really happen)
    assert(got.exists(_._3 > 0))
  }

  test("sql_values_table: every tier present, counts conserve") {
    val got = SparkEntry.queries("sql_values_table")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("high", "mid", "low"))
    val total = T(spark, TestSpark.Sf, "customer").count()
    assert(got.values.sum == total,
      "the five segments cover every customer")
  }
}
