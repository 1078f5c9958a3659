package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** |A ∩ B| for two SORTED, DISTINCT string arrays via a two-pointer
  * merge — O(|A|+|B|) with no per-call hash-set allocation, unlike
  * `size(array_intersect(...))`, which builds a hash set for every
  * pair. In the LSH verification join the arrays are per-document
  * shingle sets sorted ONCE per doc, then compared across ~n·candidate
  * pairs, so the merge form moves the whole verification into a tight
  * codegen'd loop.
  *
  * Caller contract: both inputs sorted ascending (Spark `array_sort`
  * order = UTF8 binary) and duplicate-free; the count equals the
  * distinct-set intersection size.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count expects two array<string> arguments, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
        int $i = 0; int $j = 0; long $n = 0L;
        while ($i < $a.numElements() && $j < $b.numElements()) {
          int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
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
