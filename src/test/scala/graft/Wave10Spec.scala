package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.SnapTable

/** Wave-10: restore audit semantics plus stat recomputes. */
class Wave10Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("restore re-heads an old snapshot without copying or erasing history") {
    val root = Tmp.dir("snaptab_spec")
    val o = T(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    SnapTable.create(spark, root,
      o.repartitionByRange(4, col("o_orderkey")), "o_orderkey")
    SnapTable.append(spark, root,
      o.limit(100).withColumn("o_totalprice", lit(-1.0)))
    val dataFilesBefore = dataFileCount(root)
    SnapTable.restore(spark, root, 1)
    assert(SnapTable.versions(root) == Seq(1, 2, 3))
    assert(dataFileCount(root) == dataFilesBefore,
      "restore must not write data files")
    assert(SnapTable.read(spark, root).count() ==
      SnapTable.readVersion(spark, root, 1).count())
    // the bad commit is still auditable until vacuumed
    assert(SnapTable.readVersion(spark, root, 2)
      .filter(col("o_totalprice") === -1.0).count() == 100)
  }

  test("stats_ttest_welch equals the textbook two-sample recompute") {
    val vals = T(spark, TestSpark.Sf, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select("value", "event_type").collect()
      .map(r => (math.round(r.getDouble(0) * 100) / 100.0,
        r.getString(1) == "purchase"))
    def stats(xs: Seq[Double]) = {
      val n = xs.size
      val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, va) = stats(vals.filter(_._2).map(_._1).toSeq)
    val (nb, mb, vb) = stats(vals.filterNot(_._2).map(_._1).toSeq)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    val got = SparkEntry.queries("stats_ttest_welch")(spark, TestSpark.Sf)
      .collect()(0)
    assert(got.getAs[Long]("n_a") == na && got.getAs[Long]("n_b") == nb)
    assert(math.abs(got.getAs[Double]("t_welch") - t) < 1e-3,
      s"${got.getAs[Double]("t_welch")} vs $t")
  }

  test("stats_psi_drift equals the binned recompute") {
    val vals = T(spark, TestSpark.Sf, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select("value", "event_type").collect()
      .map(r => (r.getDouble(0), r.getString(1) == "purchase"))
    val lo = vals.map(_._1).min
    val hi = vals.map(_._1).max
    val w = math.max((hi - lo) / 10.0, 1e-9)
    val n1 = vals.count(_._2)
    val n2 = vals.size - n1
    val byBin = vals.groupBy { case (v, _) =>
      math.min(math.floor((v - lo) / w).toLong, 9L)
    }
    val psi = byBin.values.map { g =>
      val p = (g.count(_._2) + 1).toDouble / (n1 + 10)
      val q = (g.count(!_._2) + 1).toDouble / (n2 + 10)
      math.round((p - q) * math.log(p / q) * 1e9)
    }.sum / 1e9
    val got = SparkEntry.queries("stats_psi_drift")(spark, TestSpark.Sf)
      .collect()(0)
    assert(got.getAs[Long]("n_bins") == byBin.size)
    assert(math.abs(got.getAs[Double]("psi") -
      math.round(psi * 1e6) / 1e6) < 1e-9)
  }

  test("stream_psi_monitor_live equals the batch per-day recompute") {
    val vals = T(spark, TestSpark.Sf, "events")
      .select(col("value"), date_trunc("day", col("ts")).as("d"))
      .collect().map(r => (r.getDouble(0), r.getAs[Any]("d") match {
        case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
        case t: java.time.LocalDateTime => t.toLocalDate
      }))
    val lo = vals.map(_._1).min
    val w = math.max((vals.map(_._1).max - lo) / 10.0, 1e-9)
    def binOf(v: Double) = math.min(math.floor((v - lo) / w).toLong, 9L)
    val nb = vals.size
    val baseline = vals.groupBy(v => binOf(v._1)).view
      .mapValues(_.size).toMap
    val brute = vals.groupBy(_._2).map { case (day, g) =>
      val nDay = g.size
      val psi = g.groupBy(v => binOf(v._1)).map { case (bin, bg) =>
        val p = (bg.size + 1).toDouble / (nDay + 10)
        val q = (baseline(bin) + 1).toDouble / (nb + 10)
        math.round((p - q) * math.log(p / q) * 1e9)
      }.sum
      day -> (nDay.toLong, math.round(psi / 1e9 * 1e6) / 1e6)
    }
    val got = SparkEntry.queries("stream_psi_monitor_live")(
      spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("win_start").toLocalDate,
        (r.getAs[Long]("n"), r.getAs[Double]("psi")))).toMap
    assert(got == brute)
  }

  private def dataFileCount(root: String): Long = {
    val dir = java.nio.file.Paths.get(root, "data")
    val s = java.nio.file.Files.walk(dir)
    try s.filter(p => p.toString.endsWith(".parquet")).count()
    finally s.close()
  }
}
