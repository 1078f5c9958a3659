package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** d14/d16's FastSS deletion-neighborhood kernel: the distinct set
  * {key} ∪ del₁(key) [∪ del₂(key)] in one linear-ish pass.
  *
  * Why an expression and not the HOF tree it replaces: each depth-1
  * variant was `concat(substring(x,1,i-1), substring(x,i+1,…))` inside
  * `transform` — two code-point seeks per position is O(len²) per key,
  * the depth-2 flatten cubes it, and `array_distinct` then re-hashes
  * the ~len²/2 duplicate-heavy variant list, all interpreted (HOFs
  * never enter codegen — the t08/t17/m06 lesson). The kernel builds
  * each variant by deleting one index from the code-point array and
  * dedups in a LinkedHashSet as it goes. Variant VALUES are identical
  * to the HOF form (deletion by code-point index — substring's
  * semantics); emission order is first-seen, which downstream cannot
  * observe (the neighborhood feeds explode → equi-join → distinct
  * canonical pairs — set semantics).
  */
object StringDeletions {
  def neighborhood(s: UTF8String, maxDist: Int): GenericArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val out = new java.util.LinkedHashSet[UTF8String]
    def add(a: Array[Int]): Unit =
      out.add(UTF8String.fromString(new String(a, 0, a.length))): Unit
    def del1(a: Array[Int], emit: Array[Int] => Unit): Unit = {
      var i = 0
      while (i < a.length) {
        val b = new Array[Int](a.length - 1)
        System.arraycopy(a, 0, b, 0, i)
        System.arraycopy(a, i + 1, b, i, a.length - i - 1)
        emit(b)
        i += 1
      }
    }
    add(cps)
    del1(cps, b => { add(b); if (maxDist >= 2) del1(b, add) })
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size))
      .asInstanceOf[Array[Any]])
  }
}

/** string → array&lt;string&gt; of the ≤maxDist deletion neighborhood. */
case class DeletionNeighborhood(child: Expression, maxDist: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deletion_neighborhood expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    StringDeletions.neighborhood(a.asInstanceOf[UTF8String], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.StringDeletions.neighborhood($a, $maxDist);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringFunctions {
  /** Codegen'd FastSS deletion neighborhood. */
  def deletionNeighborhood(c: Column, maxDist: Int): Column =
    ColumnBridge.column(DeletionNeighborhood(ColumnBridge.expression(c), maxDist))
}
