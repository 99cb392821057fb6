package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All random-hyperplane LSH bucket keys for a vector in one pass:
  * returns `array<string>` of `"<table>#<sign bits>"`, one per table.
  *
  * Hyperplane components are ±1 signs derived deterministically from
  * xxhash64 of (table, bit, dim) — no stored model, reproducible
  * across runs and executors. The sign matrix is computed once per
  * task (lazily, sized to the first vector's dimensionality) so the
  * per-row cost is nTables × nBits × dim fused multiply-adds — the
  * HOF formulation paid interpreted lambda dispatch per element and
  * dominated the ANN bench.
  */
case class HyperplaneSig(
    child: Expression, nTables: Int, nBits: Int,
    probeBits: Int = 0)
    extends UnaryExpression with CodegenFallback {

  require(probeBits >= 0 && probeBits <= nBits,
    s"probeBits $probeBits out of [0, $nBits]")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"

  // sign matrix [table*nBits + bit][dim], built on first use per task
  @transient private var signs: Array[Array[Double]] = _
  @transient private var signsDim: Int = -1

  private def signMatrix(dim: Int): Array[Array[Double]] = {
    if (signs == null || signsDim != dim) {
      signs = Array.tabulate(nTables * nBits) { tb =>
        val t = tb / nBits
        val b = tb % nBits
        Array.tabulate(dim) { d =>
          // chained xxhash64 over (t, b, d) — same shape as the SQL
          // xxhash64(t, b, d) seed chain
          var h = XxHash64Function.hash(t.toLong, LongType, 42L)
          h = XxHash64Function.hash(b.toLong, LongType, h)
          h = XxHash64Function.hash(d.toLong, LongType, h)
          if (h > 0) 1.0 else -1.0
        }
      }
      signsDim = dim
    }
    signs
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    val m = signMatrix(dim)
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) { v(d) = vec.getFloat(d).toDouble; d += 1 }
    val perTable = 1 + probeBits
    val out = new Array[Any](nTables * perTable)
    val margins = new Array[Double](nBits)
    val order = new Array[Int](nBits)
    var t = 0
    while (t < nTables) {
      val bits = new Array[Char](nBits)
      var b = 0
      while (b < nBits) {
        val row = m(t * nBits + b)
        var s = 0.0
        d = 0
        while (d < dim) { s += v(d) * row(d); d += 1 }
        bits(b) = if (s > 0) '1' else '0'
        margins(b) = math.abs(s)
        b += 1
      }
      val base = t + "#" + new String(bits)
      out(t * perTable) = UTF8String.fromString(base)
      if (probeBits > 0) {
        // margin-ordered multiprobe (Lv et al., "Multi-Probe LSH",
        // VLDB'07): flip the probeBits bits with the SMALLEST
        // hyperplane margin |s| — the signs most likely to disagree
        // with a near neighbor's — instead of all Hamming-1 buckets.
        // Candidate volume scales (1+probeBits)×, not (1+nBits)×.
        b = 0
        while (b < nBits) { order(b) = b; b += 1 }
        // partial selection sort of the probeBits smallest margins
        var f = 0
        while (f < probeBits) {
          var minI = f
          var j = f + 1
          while (j < nBits) {
            if (margins(order(j)) < margins(order(minI))) minI = j
            j += 1
          }
          val tmp = order(f); order(f) = order(minI); order(minI) = tmp
          val flipBit = order(f)
          val flipped = bits.clone()
          flipped(flipBit) = if (bits(flipBit) == '1') '0' else '1'
          out(t * perTable + 1 + f) =
            UTF8String.fromString(t + "#" + new String(flipped))
          f += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneFunctions {
  /** All LSH bucket keys (one per table) for an `array<float>` vector;
    * `probeBits > 0` adds that many margin-ordered Hamming-1 neighbor
    * buckets per table (query-side multiprobe).
    */
  def hyperplaneSig(vec: Column, nTables: Int, nBits: Int,
      probeBits: Int = 0): Column =
    GraftShim.column(HyperplaneSig(GraftShim.expression(vec), nTables, nBits, probeBits))
}
