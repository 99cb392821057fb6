package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling expressions.
  *
  * The HOF formulations (`transform(sequence(0, n-w), i ->
  * concat_ws(" ", slice(toks, i+1, w)))`) are interpreted AND
  * re-evaluate the child array expression on every lambda invocation —
  * per shingle position, the whole tokenize/normalize subtree runs
  * again (O(n²) work per row). These expressions evaluate the child
  * exactly once and build the shingle array in one compiled pass.
  */

/** Word w-shingles over an `array<string>` token column; documents
  * shorter than `w` tokens yield one shingle of all tokens joined —
  * same semantics as the original TextFunctions.wordShingles.
  */
case class WordShinglesExpr(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    if (n < w) {
      new GenericArrayData(Array[Any](UTF8String.concatWs(space, toks: _*)))
    } else {
      val out = new Array[Any](n - w + 1)
      i = 0
      while (i <= n - w) {
        out(i) = UTF8String.concatWs(space, toks.slice(i, i + w).toIndexedSeq: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character n-grams over a string column; strings of length <= n
  * yield the whole string — same semantics as the original
  * TextFunctions.charShingles (char-based, like Spark `substr`).
  */
case class CharNGramsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    if (len <= n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    } else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        out(i) = UTF8String.fromString(s.substring(i, i + n))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleFunctions {
  def wordShingles(tokens: Column, w: Int): Column =
    GraftShim.column(WordShinglesExpr(GraftShim.expression(tokens), w))

  def charNGrams(text: Column, n: Int): Column =
    GraftShim.column(CharNGramsExpr(GraftShim.expression(text), n))
}
