package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.T

/** Dev tool (round-15 plan evidence): print the formatted physical plan
  * of the SHARED interior helpers the optimization rounds touch — the
  * composed ops execute these during construction, so the final
  * returned frame's explain never shows them. Run on both trees to
  * produce the before/after plan files under plans/r15/.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def dump(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      try df.explain("formatted")
      catch { case e: Throwable => println(s"failed: $e") }
    }
    val t4 = T(s, dir, "documents")
      .filter(col("lang") === "en" && col("source").isin("src0", "src1"))
      .select(col("doc_id"),
        array_sort(array_distinct(split(col("text"), " "))).as("ts"))
    dump("prefixJaccardPairs (lexPairs shape)")(
      graft.ops.Wave64Ops.prefixJaccardPairs(t4, Nil))
    dump("saltedPrefixJaccardPairs cap=4 (text_dedup_near_split shape)")(
      graft.ops.Wave66Ops.saltedPrefixJaccardPairs(t4, Nil, 4))
    s.stop()
  }
}
