package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.T

/** Dev-only piecewise profiler for the round-13 composed ops. */
object ProfX {
  def t[A](n: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $n%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.locality.wait", "0s")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    t("guard")(graft.Guard.quadratic(T(s, dir, "documents"), "x"))
    val toks = T(s, dir, "documents")
      .filter(col("lang") === "en" && col("source").isin("src0", "src1"))
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tokset"))
    t("slice count")(println("slice=" + toks.count()))
    val a = toks.select(col("doc_id").as("a"), col("tokset").as("sa"))
    val b = toks.select(col("doc_id").as("b"), col("tokset").as("sb"))
    val lex = a.join(b, col("a") < col("b"))
      .withColumn("inter",
        size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .filter(round(col("inter") / (size(col("sa")) + size(col("sb"))
        - col("inter")), 6) >= 0.8)
      .select("a", "b")
    t("lex pairs")(println("lex=" + lex.count()))
    val (route, gridded, _) = graft.ops.Wave62Ops.semdedupGeometry(s, dir)
    val f = t("route+persist") {
      val ff = route(gridded).persist(); ff.count(); ff
    }
    val sem = graft.ops.Wave64Ops.semPairs(f)
    t("sem pairs")(println("sem=" + sem.count()))
    val nodes = T(s, dir, "documents").select(col("doc_id").as("id"))
    val comp = t("ccMinLabel")(
      graft.ops.Wave64Ops.ccMinLabel(s, nodes, lex.union(sem), "prof"))
    t("comp count")(println("comp=" + comp.count()))
    s.stop()
  }
}
