package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused dot product over two `array<float>` columns, as a native
  * Catalyst expression with whole-stage codegen.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a,b,*), 0.0, +)`) is interpreted
  * (CodegenFallback) and allocates an intermediate array per row; this
  * expression is one fused loop inside Tungsten codegen — the ANN
  * scoring hot path at corpus scale. Accumulation order (left fold,
  * float→double per element) matches the HOF version bitwise, so the
  * two are interchangeable without perturbing oracle results.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float>; callers go through VectorFunctions
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused dot product over two `array<tinyint>` columns — the scoring
  * kernel for int8 scalar-quantized embeddings ([[graft.similarity
  * .Sq8]]). Accumulates in a 64-bit integer: 2^15 dims × 127² fits
  * with ~2^48 headroom, so the kernel is EXACT integer arithmetic —
  * no float-order sensitivity — and the only approximation in the
  * SQ8 path is the quantization itself.
  */
case class ByteVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two `array<long>` columns hold equal
  * values — the MinHash signature-agreement kernel. The HOF
  * formulation (`aggregate(zip_with(a,b,=), 0, +)`) is interpreted
  * and costs a lambda dispatch per slot per pair; this is one fused
  * codegen loop.
  */
case class LongArrayAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "long_array_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[FloatVecDot]]. */
  def vecDot(a: Column, b: Column): Column =
    GraftShim.column(FloatVecDot(GraftShim.expression(a), GraftShim.expression(b)))

  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Column API for [[ByteVecDot]]. */
  def byteVecDot(a: Column, b: Column): Column =
    GraftShim.column(ByteVecDot(GraftShim.expression(a), GraftShim.expression(b)))

  /** Column API for [[LongArrayAgree]]. */
  def longArrayAgree(a: Column, b: Column): Column =
    GraftShim.column(LongArrayAgree(GraftShim.expression(a), GraftShim.expression(b)))
}
