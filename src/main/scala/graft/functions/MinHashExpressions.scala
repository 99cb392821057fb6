package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature over an `array<string>` shingle column.
  *
  * Each shingle is hashed ONCE (xxhash64, seed 42); the k hash family
  * is derived from that base value with k universal mul-xor-shift
  * transforms (splitmix64-generated odd multipliers/addends) — the
  * standard single-base-hash MinHash construction: estimator quality
  * is the same as k independent string hashes, at one string pass +
  * k mul-adds per shingle instead of k full string hashes (~10×).
  *
  * CodegenFallback (the eval loop is already a tight compiled loop;
  * per-row codegen would only inline the same calls), but unlike the
  * HOF formulation there is no per-seed lambda dispatch, no
  * intermediate hash arrays, and the shingle array is read once.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  // deterministic per-slot odd multipliers + addends (splitmix64)
  private val mulAdd: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Array.fill(2 * k)(next())
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val base = XxHash64Function.hash(s, StringType, 42L)
        var j = 0
        while (j < k) {
          var h = base * (mulAdd(2 * j) | 1L) + mulAdd(2 * j + 1)
          h ^= (h >>> 29) // finalize: decorrelate high/low bits
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {
  /** Column API for [[MinHashSig]]. Input: array<string> shingles. */
  def minhashSig(shingles: Column, k: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(shingles), k))
}
