package graft.examples

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: does Dataset.localCheckpoint() deliver observe() metrics?
  * (If yes, ccMinLabel can piggyback its convergence sums on the
  * checkpoint materializations instead of separate jobs.)
  */
object ProfObs {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val df = (1L to 1000L).toDF("id")
    val obs = Observation("t")
    val cp = org.apache.spark.sql.graftx.Bridge
      .localCheckpointHonestStats(
        df.observe(obs, sum(col("id").cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("n")))
    println("cp rows=" + cp.count())
    val got = obs.get
    println("observed=" + got)
    s.stop()
  }
}
