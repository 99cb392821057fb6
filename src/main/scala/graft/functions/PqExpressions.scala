package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011). A vector splits into `m`
  * subvectors; each is replaced by the index of its nearest centroid
  * in that subspace's `k`-entry codebook — the corpus then stores `m`
  * BYTES per vector instead of `dim` floats, and approximate distances
  * come from per-query lookup tables without touching the original
  * vectors. The memory-bounded ANN path: at 100 TB the encoded corpus
  * is ~dim×4/m smaller than the raw embeddings (32× at dim=64, m=8).
  *
  * Codebooks ride into the plan as ONE referenced object per
  * expression (same broadcast shape as
  * [[CentroidTopCells]]); the per-row loops live in compiled `compute`
  * kernels called from whole-stage codegen.
  */

/** Encode `array<float>` → `binary` of `m` code bytes: per subspace,
  * the argmin-L2 centroid index (ties to the lower index). Requires
  * k ≤ 256.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
  require(codebooks.forall(_.length <= 256), "PQ codes are bytes: k must be <= 256")

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  def compute(a: ArrayData): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](m)
    var off = 0
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val dsub = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cen = cb(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = a.getFloat(off + j).toDouble - cen(j).toDouble
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      off += dsub
      s += 1
    }
    out
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: `array<float>` of m·k entries, entry
  * `s·k + c` = squared L2 distance between the query's subvector `s`
  * and centroid `c` of that subspace. Computed ONCE per query row;
  * every corpus code is then scored by `m` table lookups
  * ([[PqAdcDist]]) instead of `dim` multiplies.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"

  private val k: Int = codebooks.map(_.length).max

  def compute(a: ArrayData): ArrayData = {
    val m = codebooks.length
    val out = new Array[Any](m * k)
    var off = 0
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val dsub = cb(0).length
      var c = 0
      while (c < k) {
        var d = 0.0
        if (c < cb.length) {
          val cen = cb(c)
          var j = 0
          while (j < dsub) {
            val t = a.getFloat(off + j).toDouble - cen(j).toDouble
            d += t * t
            j += 1
          }
        } else d = Double.MaxValue
        out(s * k + c) = d.toFloat
        c += 1
      }
      off += dsub
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Approximate squared L2 distance from a query's LUT (`array<float>`,
  * m·k flattened) to a corpus code (`binary`, m bytes): Σ_s
  * lut[s·k + code_s]. The ADC hot loop — m array reads and adds per
  * corpus row, fully inside codegen.
  */
case class PqAdcDist(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 1 && k <= 256, s"k out of range: $k")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_dist"

  def compute(lut: ArrayData, codes: Array[Byte]): Double = {
    var d = 0.0
    var s = 0
    while (s < codes.length) {
      d += lut.getFloat(s * k + (codes(s) & 0xFF))
      s += 1
    }
    d
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcDist", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftShim.column(PqEncode(GraftShim.expression(vec), codebooks))

  def pqLut(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftShim.column(PqLut(GraftShim.expression(vec), codebooks))

  def pqAdcDist(lut: Column, codes: Column, k: Int): Column =
    GraftShim.column(
      PqAdcDist(GraftShim.expression(lut), GraftShim.expression(codes), k))
}
