package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{T, Tmp}

/** Dev-only piecewise profiler for pipe_curation_live (the round-14
  * optimization round's dominant op): wall time, Spark JOB count and
  * summed task time per phase — the job count is the tell for
  * "too many tiny eager materializations" at fixture scale.
  */
object ProfLive {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.locality.wait", "0s")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0L
    @volatile var taskMs = 0L
    val sites = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.LongAdder]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        val site = j.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name.takeWhile(_ != '+').trim).getOrElse("?")
        sites.computeIfAbsent(site,
          _ => new java.util.concurrent.atomic.LongAdder()).increment()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          taskMs += t.taskMetrics.executorRunTime
    })
    def dumpSites(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      println(s"SITES $tag")
      sites.asScala.toSeq.sortBy(-_._2.sum).take(25).foreach {
        case (k, v) => println(f"  ${v.sum}%5d  $k")
      }
      sites.clear()
    }
    def t[A](n: String)(f: => A): A = {
      val (j0, m0, t0) = (jobs, taskMs, System.nanoTime())
      val r = f
      // listener events are async; give the bus a beat
      Thread.sleep(300)
      println(f"PROF $n%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"jobs=${jobs - j0}%4d  taskTime=${(taskMs - m0) / 1e3}%8.1f s")
      r
    }

    import graft.ops.Wave65Ops.LiveFunnel._
    t("warm") {
      T(s, dir, "documents").count()
      T(s, dir, "embeddings").count()
    }
    val docs = T(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        col("text"), col("n_chars"))
    val (route, gridded, _) =
      t("geometry")(graft.ops.Wave62Ops.semdedupGeometry(s, dir))
    val landingDf = docs.join(
      gridded.withColumnRenamed("vec_id", "doc_id"),
      Seq("doc_id"), "left")
    val landing = Tmp.dir("graft_proflive_landing")
    val txroot = Tmp.dir("graft_proflive_tx")
    val ckpt = Tmp.dir("graft_proflive_ckpt")
    t("setup")(setup(s, txroot, landingDf.limit(0), route, docs))
    sys.env.get("PROF_BC").foreach(v =>
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    sys.env.get("PROF_AQE").foreach(v =>
      s.conf.set("spark.sql.adaptive.enabled", v))
    val maxId = docs.agg(max("doc_id")).first().getLong(0)
    val (c1, c2) = ((maxId + 1) / 3, 2 * (maxId + 1) / 3)
    // DIRECT ingest calls (no stream transport) so job callsites are
    // attributable; the graded op's transport adds ~2 s total on top.
    sites.clear()
    t("wave 0")(ingest(s, txroot,
      landingDf.filter(col("doc_id") >= c1 && col("doc_id") < c2),
      0L, route))
    dumpSites("wave0")
    t("wave 1")(ingest(s, txroot,
      landingDf.filter(col("doc_id") < c1), 1L, route))
    dumpSites("wave1")
    t("wave 2")(ingest(s, txroot,
      landingDf.filter(col("doc_id") >= c2), 2L, route))
    t("serve")(println("rows=" +
      serve(s, txroot).orderBy("doc_id").count()))
    println("unused: " + (landing, ckpt, Trigger.AvailableNow()))
    s.stop()
  }
}
