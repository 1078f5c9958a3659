package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** |A ∩ B| for two SORTED, DISTINCT arrays (string or bigint) via a
  * two-pointer merge — O(|A|+|B|) with no per-call hash-set
  * allocation, unlike `size(array_intersect(...))`, which builds a
  * hash set for every pair. In the LSH verification join the arrays
  * are per-document shingle sets sorted ONCE per doc, then compared
  * across ~n·candidate pairs, so the merge form moves the whole
  * verification into a tight codegen'd loop. The bigint form (r15)
  * serves the HASHED shingle sets d04/d18 ship through the pair
  * exchanges — 8 B/element vs ~20 B strings, and a long compare
  * instead of a byte-wise one.
  *
  * Caller contract: both inputs sorted ascending (Spark `array_sort`
  * order: UTF8 binary for strings, numeric for longs) and
  * duplicate-free; the count equals the distinct-set intersection
  * size.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count expects two array<string> or two " +
            s"array<bigint> arguments, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0L
    if (isLong) {
      while (i < nx && j < ny) {
        val c = java.lang.Long.compare(x.getLong(i), y.getLong(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val cmp =
        if (isLong) s"Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
        int $i = 0; int $j = 0; long $n = 0L;
        while ($i < $a.numElements() && $j < $b.numElements()) {
          int $c = $cmp;
          if ($c == 0) { $n++; $i++; $j++; }
          else if ($c < 0) { $i++; } else { $j++; }
        }
        ${ev.value} = $n;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
