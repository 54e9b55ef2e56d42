package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev-only: attribute analyzer/optimizer warnings (e.g. HintErrorLogger's
  * "broadcast hint is not part of a join relation") to the op that causes
  * them. Emits a stderr marker per op, then forces the optimized plan so
  * hint resolution runs; the warn line lands between markers in the log.
  * Usage: runMain graft.examples.HintHunt [sfDir]
  */
object HintHunt {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      System.err.println(s"### OP $n")
      System.err.flush()
      try fn(s, dir).queryExecution.executedPlan
      catch { case e: Throwable =>
        System.err.println(s"### ERR $n ${e.getClass.getSimpleName}") }
    }
    s.stop()
  }
}
