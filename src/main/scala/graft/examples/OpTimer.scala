package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev-only: time named SparkEntry ops k times in ONE JVM and report each
  * run + the min (the host is noisy; min-of-k in-process is the only
  * comparable number). Usage:
  * runMain graft.examples.OpTimer op1,op2 [k] [sfDir]
  * (the optional dir arg overrides SPARK_GRAFT_SF_DIR — sbt -client
  * forwards args but not the caller's env)
  */
object OpTimer {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).toSeq
    val k = if (args.length > 1) args(1).toInt else 3
    val dir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.locality.wait", "0s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.read.parquet(s"$dir/lineitem.parquet").count() // warm
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val times = (1 to k).map { _ =>
        val t0 = System.nanoTime()
        fn(s, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"OPTIME $n%-28s min=${times.min}%7.2f  runs=" +
        times.map(t => f"$t%.2f").mkString(","))
    }
    s.stop()
  }
}
