package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (UDTF tier of SURVEY §2.11): explode
  * an array of tokens into its space-joined n-grams — one output row per
  * window. A real Catalyst [[Generator]] (like `explode`/`stack`), so it
  * plans through `Generate` with column pruning intact, rather than a
  * Scala UDF returning arrays that would black-box the plan.
  *
  * `n` is fixed at registration time (the SQL arg must be a literal int).
  * Windows shorter than n yield nothing (a 2-token doc has no trigrams).
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n > 0, s"ngrams: n must be > 0, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngrams expects array<string>, got ${other.sql}")
  }

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Nil
    else {
      val toks = arr.asInstanceOf[ArrayData]
      val m = toks.numElements()
      if (m < n) Nil
      else (0 to m - n).iterator.map { i =>
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          j += 1
        }
        InternalRow(UTF8String.fromString(sb.toString))
      }
    }
  }

  override def prettyName: String = "ngrams"
  override protected def withNewChildInternal(
      newChild: Expression): NGramGenerator = copy(child = newChild)
}

object NGramGenerator {
  /** Register `ngrams(arr, litN)` as a session generator function
    * (idempotent); the second argument must be a literal integer.
    */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngrams", args => {
        val n = args(1) match {
          case e if e.foldable =>
            e.eval(null) match {
              case i: Number => i.intValue()
              case _ => throw new IllegalArgumentException(
                "ngrams: n must be a literal int")
            }
          case _ => throw new IllegalArgumentException(
            "ngrams: n must be a literal int")
        }
        NGramGenerator(args.head, n)
      }, "built-in")
}
