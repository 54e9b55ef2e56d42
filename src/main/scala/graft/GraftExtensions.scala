package graft

import graft.functions.FloatVecDot
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
  * registers graft's native Catalyst functions (currently `fvdot`, the
  * codegen'd float-vector dot product) in every new session — the idiomatic
  * Spark mechanism for shipping engine extensions, vs. per-session
  * `VecExprs.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("fvdot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "fvdot"),
      (args: Seq[Expression]) => FloatVecDot(args.head, args(1))))
  }
}
