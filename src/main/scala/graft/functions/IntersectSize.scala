package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `|a ∩ b|` over two SORTED, DISTINCT, non-null ARRAY<LONG> columns — a
  * zero-allocation merge-count, the codegen replacement for the per-pair
  * `size(array_intersect(sa, sb))` verification step of the near-dup
  * family (q22 / q23 / q79). `array_intersect` builds a SQLOpenHashSet
  * and dispatches through `PhysicalDataType` per ELEMENT per pair —
  * sampled as q79's top task-CPU frames after the shingle/hash kernels
  * landed (round 16, guide §1.2). The caller guarantees order and
  * distinctness (the verify frames are `sort_array`ed hash sets);
  * IntersectSizeSpec pins equality against `size(array_intersect(…))`
  * on arbitrary generated inputs.
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_long_intersect_size needs ARRAY<LONG> args, got $l, $r")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectSize.mergeCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectSize.mergeCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Static kernel (no companion class → janino-callable forwarder). */
object IntersectSize {
  def mergeCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}
