package graft

import graft.functions.{FloatVecDot, FloatVecL2, SortedLongIntersectSize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for `spark.sql.extensions`:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * registers graft's native Catalyst functions (`fvdot`/`fvl2`, the
  * codegen'd float-vector dot product and squared-L2 distance, and
  * `lixsize`, the sorted-long-array merge intersect) in every new
  * session — the idiomatic Spark mechanism for shipping engine
  * extensions, vs. per-session `VecExprs.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // maintenance-verb SQL (OPTIMIZE / VACUUM / DESCRIBE HISTORY) for
    // snap catalogs; everything else delegates to Spark's parser
    e.injectParser((_, delegate) =>
      new graft.sources.SnapSqlParser(delegate))
    // optimizer rule: HOF dot-product idiom → native FloatVecDot
    e.injectOptimizerRule(_ => graft.plans.RewriteHofVecDot)
    e.injectFunction((
      FunctionIdentifier("fvdot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "fvdot"),
      (args: Seq[Expression]) => FloatVecDot(args.head, args(1))))
    e.injectFunction((
      FunctionIdentifier("fvl2"),
      new ExpressionInfo(classOf[FloatVecL2].getName, "fvl2"),
      (args: Seq[Expression]) => FloatVecL2(args.head, args(1))))
    e.injectFunction((
      FunctionIdentifier("lixsize"),
      new ExpressionInfo(classOf[SortedLongIntersectSize].getName, "lixsize"),
      (args: Seq[Expression]) => SortedLongIntersectSize(args.head, args(1))))
  }
}
