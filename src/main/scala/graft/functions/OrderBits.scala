package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving IEEE-754 bit image of a double: a LONG `m(v)`
  * with `v1 <= v2  ⇔  m(v1) <= m(v2)` (for non-NaN inputs, with
  * `m(-0.0) == m(+0.0) == 0` so numeric ties stay ties).
  *
  *   - v >= +0.0: the raw bit pattern is non-negative and already
  *     ascending with the value — `m = bits`.
  *   - v < 0: the raw pattern has the sign bit set and its magnitude
  *     grows as the value DECREASES — `m = -(bits & Long.MaxValue)`
  *     (negate the magnitude), ascending again and always below the
  *     positives. `-(2^63-1)` is the minimum, so no overflow.
  *
  * Why it exists: [[graft.util.OrderStats]] buckets selection ranges
  * in this bit space. A double range holds at most 2^64 distinct bit
  * values, so splitting the BIT interval into B buckets divides it by
  * B every round — a structural convergence bound (≤ ceil(64/log2 B)
  * rounds) that value-space bucketing cannot give: for log-spread
  * data (values spanning hundreds of binades) a linear value split
  * eliminates only a few exponents per round.
  */
case class DoubleOrderBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"double_order_bits expects double, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val b = java.lang.Double.doubleToRawLongBits(a.asInstanceOf[Double])
    if (b >= 0L) b else -(b & Long.MaxValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("bits")
      s"""
        long $b = Double.doubleToRawLongBits($a);
        ${ev.value} = ($b >= 0L) ? $b : -($b & Long.MAX_VALUE);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DoubleOrderBits {
  def orderBits(c: Column): Column =
    ColumnBridge.column(DoubleOrderBits(ColumnBridge.expression(c)))
}
