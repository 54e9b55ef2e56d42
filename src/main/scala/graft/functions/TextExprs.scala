package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |a ∩ b| for two SORTED long arrays via a
  * linear merge — no per-element hashing, no set allocation, stays inside
  * WholeStageCodegen. This is the hot inner op of LSH near-dup
  * verification: `array_intersect` on string arrays builds a hash set of
  * string comparisons per row; pre-hashing tokens to sorted int64 and
  * merging is several times cheaper on ~500-token documents.
  *
  * Inputs MUST be sorted ascending with distinct elements (the caller
  * builds them with `.distinct.sorted`); output is undefined otherwise.
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lixsize expects two array<bigint> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "lixsize"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Unicode canonical composition (NFC) — the same transform as DuckDB's
  * `nfc_normalize`. Spark exposes no normalization builtin; a UDF would
  * drop the projection out of WholeStageCodegen, so this is a native
  * unary expression (one static Normalizer call per row, codegen'd).
  * Normalizer.isNormalized short-circuits the (overwhelmingly common)
  * already-NFC case without allocating.
  */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc expects a string arg, got ${child.dataType.sql}")
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc"

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    NfcNormalize.nfc(u)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.unsafe.types.UTF8String
  /** static helper shared by eval and generated code */
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFC))
  }
}

object TextExprs {
  /** Register `lixsize` + `nfc` in the session's function registry
    * (idempotent). */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lixsize", args => SortedLongIntersectSize(args.head, args(1)),
      "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc", args => NfcNormalize(args.head),
      "built-in")
  }
}
