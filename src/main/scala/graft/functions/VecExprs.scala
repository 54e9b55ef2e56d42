package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for Σ aᵢ·bᵢ over two float arrays,
  * accumulated in double, left-to-right — bit-identical to the
  * `aggregate(zip_with(...))` HOF formulation and to the DuckDB oracle's
  * positional-unnest sum, but ~20× faster: the HOF path interprets a lambda
  * per element, this one is a tight codegen'd loop inside WholeStageCodegen
  * (no UDF serialization, no per-element boxing).
  *
  * Null semantics REPLICATE the HOF exactly so that
  * [[graft.plans.RewriteHofVecDot]] is a sound rewrite on every input:
  * `zip_with` pads the shorter array with nulls and a null product poisons
  * the running sum, so a length mismatch or any null element yields NULL —
  * not a min-length partial sum.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fvdot expects two array<float> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fvdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two float arrays, widened to double per element,
  * left-to-right — the squared-L2 twin of [[FloatVecDot]], with the same
  * codegen design. NOT computed as |a|²−2a·b+|b|² (algebraically equal but
  * numerically different) so the DuckDB positional-unnest oracle matches
  * bit-for-bit.
  */
case class FloatVecL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fvl2 expects two array<float> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fvl2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecL2 =
    copy(left = newLeft, right = newRight)
}

object VecExprs {
  /** Register `fvdot`/`fvl2` in the session's function registry
    * (idempotent) so they are usable from `expr(...)` and plain SQL.
    */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fvdot", args => FloatVecDot(args.head, args(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fvl2", args => FloatVecL2(args.head, args(1)), "built-in")
  }
}
