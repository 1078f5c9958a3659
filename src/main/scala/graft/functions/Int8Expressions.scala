package graft.functions

import org.apache.spark.sql.Column

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType, LongType}

/** Shared arithmetic for the int8 vector path — static helpers the
  * generated code calls, so interpreted eval and codegen share one
  * definition.
  */
object Int8Ops {
  /** HALF_UP rounding through the decimal string representation —
    * EXACTLY what Spark's `round(double)` computes for DoubleType
    * (`BigDecimal.decimal(d)` = `java.math.BigDecimal.valueOf(d)` =
    * `new BigDecimal(Double.toString(d))`, then `setScale(0,
    * HALF_UP)`), which is the form the oracle-green HOF pipeline this
    * kernel replaces used. `Math.floor(v + 0.5)` is NOT equivalent
    * (0.49999999999999994 + 0.5 rounds to 1.0 in binary; the decimal
    * form yields 0), so the BigDecimal path is load-bearing for
    * bit-parity with both the HOF form and DuckDB's round().
    * Per-element allocation is fine here: quantization runs once per
    * corpus VECTOR (ingest-time), not once per candidate pair.
    */
  def roundHalfUpToByte(v: Double): Byte =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).byteValue()

  /** Symmetric per-vector int8 scalar quantization of a float vector:
    * q_i = round(x_i · 127 / max|x|), the all-zero vector mapping to
    * all-zero bytes. |q_i| ≤ 127 by construction (|x_i| ≤ max|x|, and
    * the two FP roundings can push the scaled value at most ~2 ulp
    * past 127.0 — far below the 127.5 a HALF_UP would need to reach
    * 128), so every component is a valid signed byte.
    */
  def quantize(x: ArrayData): Array[Byte] = {
    val n = x.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > maxabs) maxabs = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxabs != 0.0) {
      i = 0
      while (i < n) {
        out(i) = roundHalfUpToByte(x.getFloat(i).toDouble * 127.0 / maxabs)
        i += 1
      }
    }
    out
  }
}

/** Int8 vector kernel as native codegen expressions — the quantized
  * twin of [[FloatVecDot]]/[[FloatVecNorm]], and for the same measured
  * reason: Spark's higher-order functions evaluate their lambdas
  * interpreted with per-element boxing (the r9 t08 lesson, 1600×), and
  * the quantized dot runs once per CANDIDATE PAIR in the rerank hot
  * path. Vectors travel as BinaryType — one byte per component, the
  * 4×-vs-float32 store shrink that is the whole point of the int8
  * path (an array<tinyint> column would round-trip through ArrayData
  * headers and per-element null bits; a byte[] is the wire format).
  *
  * Determinism: dot and norm² are INTEGER sums of bounded terms
  * (|q|≤127, 64 dims ⇒ |dot| ≤ ~10⁶), order-independent, identical
  * bits in interpreted eval, codegen, and the DuckDB list_reduce
  * mirror — no fold-order contract needed (contrast [[FloatVecDot]]).
  *
  * Null-element contract: quantization reads raw floats (the
  * embeddings ingest schema has containsNull=false); a null slot in a
  * malformed array would read as 0.0f rather than poison the result
  * the way the replaced HOF chain's null propagation did — acceptable
  * because the input contract excludes it and the spec pins
  * bit-parity on the real corpus.
  */
case class Float32ToInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"float32_to_int8 expects array<float>, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    Int8Ops.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.Int8Ops.quantize($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product of two int8 vectors (binary columns). */
case class Int8VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_vec_dot expects two binary arguments, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += (x(i) * y(i)).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.length, $b.length);
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $acc += (long) ($a[$i] * $b[$i]);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer squared L2 norm of an int8 vector (binary column). */
case class Int8VecNormSq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_vec_norm_sq expects binary, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    var acc = 0L
    var i = 0
    while (i < x.length) {
      acc += (x(i) * x(i)).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        long $acc = 0L;
        for (int $i = 0; $i < $a.length; $i++) {
          $acc += (long) ($a[$i] * $a[$i]);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Functions {
  /** Codegen'd symmetric int8 quantization: array<float> → binary. */
  def int8Quantize(a: Column): Column =
    ColumnBridge.column(Float32ToInt8(ColumnBridge.expression(a)))

  /** Codegen'd integer dot of two int8 (binary) vectors. */
  def int8Dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      Int8VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd integer squared norm of an int8 (binary) vector. */
  def int8NormSq(a: Column): Column =
    ColumnBridge.column(Int8VecNormSq(ColumnBridge.expression(a)))
}
