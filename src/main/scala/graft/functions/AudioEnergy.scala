package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** m06's window-energy kernel: one linear pass over the payload's code
  * points producing the per-window Σ(s−128)² array.
  *
  * Why an expression and not a HOF tree: `ascii(substring(text, i, 1))`
  * inside `aggregate`/`transform` re-seeks the UTF-8 string from the
  * START for every character (code-point indexing is O(i)), making the
  * per-doc energy pass O(n²) — measured 66 s warm at sf1 for what is a
  * linear scan (the same lesson as t17's PiiScan: the kernel call is
  * the codegen'd form of the whole pass). Sample semantics are exactly
  * the HOF form's: sample i = first code point of the i-th 1-char
  * substring — i.e. the string's code points in order — so the DuckDB
  * oracle (chars == code points there) is unchanged.
  */
object AudioEnergy {
  /** Per-window energies of `s` at window width `win` (code points as
    * unsigned-8-bit-PCM-style samples, centered at 128).
    */
  def energies(s: UTF8String, win: Int): GenericArrayData = {
    val str = s.toString
    var i = 0
    var cnt = 0
    // count code points first to size the output exactly
    val n = str.codePointCount(0, str.length)
    val nw = (n + win - 1) / win
    val out = new Array[Long](nw)
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val v = cp.toLong - 128L
      out(cnt / win) += v * v
      cnt += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(out)
  }
}

/** string → array&lt;bigint&gt; of per-window energies (width fixed at
  * [[graft.mm.Multimodal.AudioStub.WIN]] by the caller-built instance).
  */
case class AudioEnergies(child: Expression, win: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_energies expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    AudioEnergy.energies(a.asInstanceOf[UTF8String], win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.AudioEnergy.energies($a, $win);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioFunctions {
  /** Codegen'd per-window energy pass. */
  def audioEnergies(c: Column, win: Int): Column =
    ColumnBridge.column(AudioEnergies(ColumnBridge.expression(c), win))
}
