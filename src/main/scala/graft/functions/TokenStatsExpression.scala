package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}

/** Per-row term-frequency summary of a token (or n-gram) array:
  * (n_terms, n_distinct, top_count) — the primitives behind
  * repetition-based quality filtering (C4/Gopher-style rules: drop
  * documents whose duplicate-term fraction `1 − n_distinct/n_terms`
  * or top-term occupancy `top_count/n_terms` is pathological —
  * boilerplate, keyword stuffing, template spam).
  *
  * One hash-counting pass per row, no shuffle, no explode: the
  * declarative alternative (explode → groupBy(doc, term) → groupBy
  * doc) shuffles every token of the corpus twice, which at 100 TB is
  * the difference between a projection and a job. Ints only — ratio
  * arithmetic is left to the caller so oracle comparison stays exact.
  */
case class TokenTermStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_terms", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_term_stats"

  /** The per-row kernel; public so generated code can call it. */
  def compute(a: ArrayData): InternalRow = {
    val n = a.numElements()
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Int]]()
    var total = 0
    var top = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        total += 1
        val t = a.getUTF8String(i)
        var c = counts.get(t)
        if (c == null) { c = new Array[Int](1); counts.put(t.clone(), c) }
        c(0) += 1
        if (c(0) > top) top = c(0)
      }
      i += 1
    }
    InternalRow(total, counts.size(), top)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenTermStats", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStatsFunctions {
  /** Column API for [[TokenTermStats]] over any array<string> column. */
  def termStats(terms: Column): Column =
    GraftShim.column(TokenTermStats(GraftShim.expression(terms)))
}
