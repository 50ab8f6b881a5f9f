package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY §2.8 F7/F8
  * plan (c)): dot product and L2 norm over ARRAY<FLOAT>/ARRAY<DOUBLE> with
  * `doGenCode`, so SQL-surface queries stay inside whole-stage codegen with
  * no per-row intermediate array allocation (unlike the HOF
  * `aggregate(zip_with(...))` form, which remains the correctness oracle —
  * [[VectorFunctions.dot]]).
  *
  * Numeric contract (shared with the oracle and the [[graft.operators.BruteForce]]
  * kernel): accumulate in double, in array order — bitwise-identical to
  * DuckDB's unnest-sum on the same lists. Array elements are assumed
  * non-null (embedding fixtures guarantee it; asserted in tests).
  */
private object VecExpr {
  /** Per-element read snippet for float vs double arrays. */
  def reader(t: DataType, arr: String, i: String): String = t match {
    case ArrayType(FloatType, _)  => s"(double)$arr.getFloat($i)"
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  def read(t: DataType, arr: ArrayData, i: Int): Double = t match {
    case ArrayType(FloatType, _)  => arr.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => arr.getDouble(i)
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }
}

/** `vec_dot(a, b)` = Σ a_i·b_i (double accumulation, array order). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (VecExpr.ok(left.dataType) && VecExpr.ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs ARRAY<FLOAT|DOUBLE> args, got ${left.dataType}, ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += VecExpr.read(left.dataType, x, i) * VecExpr.read(right.dataType, y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $s = 0.0;
         |int $n = Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${VecExpr.reader(left.dataType, a, i)} * ${VecExpr.reader(right.dataType, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `vec_norm(a)` = sqrt(Σ a_i²) (double accumulation, array order). */
case class L2NormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (VecExpr.ok(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_norm needs an ARRAY<FLOAT|DOUBLE> arg, got ${child.dataType}")

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = VecExpr.read(child.dataType, x, i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $s = 0.0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${VecExpr.reader(child.dataType, a, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2NormExpr =
    copy(child = newChild)
}
