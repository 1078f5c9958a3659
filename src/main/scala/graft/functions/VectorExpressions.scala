package graft.functions

import org.apache.spark.sql.Column

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (`aggregate`, `transform`) evaluate
  * their lambdas interpreted — fine for projections, but a 64-step
  * fold per candidate pair dominates the ANN/near-dup joins. These
  * expressions emit a tight Java loop via `doGenCode`, keeping the dot
  * product inside whole-stage codegen (~10× over the HOF form at
  * sf0.1).
  *
  * Bit-parity contract (see graft.sim.Cosine): the loop accumulates
  * LEFT TO RIGHT IN INDEX ORDER with per-element double casts —
  * exactly the fold the DuckDB oracle (`list_reduce`) performs, so
  * results stay bit-identical to both the oracle and the HOF
  * implementation they replace.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"float_vec_dot expects two array<float> arguments, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an Array[Float] column — same in-order fold contract. */
case class FloatVecNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"float_vec_norm expects array<float>, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
        int $n = $a.numElements();
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $v = (double) $a.getFloat($i);
          $acc += $v * $v;
        }
        ${ev.value} = java.lang.Math.sqrt($acc);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-LSH signature: bit j of the result is set iff
  * `vec[dims(j)] >= 0` — the Catalyst-native form of the CASE-sum the
  * sign-LSH family previously built as a SQL string. The string form
  * is O(bits) CASE branches PER TABLE; at the scale family's 96+
  * tables × 13 bits the generated projection method blows Janino's
  * 64 KB limit and the whole stage silently falls back to interpreted
  * — this expression emits one constant-array loop per table instead,
  * keeping arbitrarily large table families inside whole-stage
  * codegen. Semantics identical to the SQL form (`>= 0` per float, bit
  * j weight 1<<j), so LSH buckets — and thus s02/s06 results — are
  * unchanged.
  */
case class FloatVecSignBits(child: Expression, dims: Seq[Int])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) if dims.nonEmpty && dims.size <= 31 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"float_vec_sign_bits expects 1..31 dims, got ${dims.size}")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"float_vec_sign_bits expects array<float>, got ${other.catalogString}")
    }

  // A null array element leaves its bit UNSET — the CASE-sum SQL form
  // this replaces yields ELSE 0 for a null slot, whereas a bare
  // getFloat on a null slot reads 0.0 and would SET the bit.
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var sig = 0
    var j = 0
    while (j < dims.length) {
      if (!x.isNullAt(dims(j)) && x.getFloat(dims(j)) >= 0f) sig |= 1 << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val dimsRef = ctx.addReferenceObj("dims", dims.toArray, "int[]")
      val j = ctx.freshName("j")
      val sig = ctx.freshName("sig")
      s"""
        int $sig = 0;
        for (int $j = 0; $j < $dimsRef.length; $j++) {
          if (!$a.isNullAt($dimsRef[$j]) && $a.getFloat($dimsRef[$j]) >= 0f) $sig |= 1 << $j;
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Codegen'd in-index-order dot product of two Array[Float] columns. */
  def floatDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd L2 norm of an Array[Float] column. */
  def floatNorm(a: Column): Column =
    ColumnBridge.column(FloatVecNorm(ColumnBridge.expression(a)))

  /** Codegen'd sign-LSH signature over the given 0-based dims. */
  def floatSignBits(a: Column, dims: Seq[Int]): Column =
    ColumnBridge.column(FloatVecSignBits(ColumnBridge.expression(a), dims))
}
