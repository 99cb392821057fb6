package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Top-`n` nearest coarse-quantizer cells for an `array<float>` vector
  * against a BROADCAST centroid matrix — the large-`nLists` companion
  * of the literal-tree formulation in [[graft.similarity.Ivf]].
  *
  * Why a matrix, not literals: `least(struct(d, cell), ...)` /
  * `array_sort(array(struct(...), ...))` build one expression subtree
  * PER centroid. Elegant and whole-stage-codegen'd at nLists ≤ ~64,
  * but a 100 TB corpus wants nLists ~10⁴-10⁵, where a 65k-branch
  * expression tree breaks Janino method-size/constant-pool limits long
  * before it runs. Here the centroids ride along as ONE plan object
  * (serialized once per task via the expression reference, exactly the
  * broadcast shape), and the scan stays inside whole-stage codegen —
  * the generated code calls back into this expression's compiled
  * `compute` loop, so per-row cost is the irreducible k·dim
  * multiply-adds plus one virtual call.
  *
  * Ordering contracts match the literal path bitwise so the two are
  * interchangeable without perturbing results (IvfSpec asserts):
  *  - metric "l2": score = dot(v,c) * -2.0 + |c|²  (the |v|² term is
  *    constant per row — same argmin as true L2), the `nearestCell`
  *    arithmetic in evaluation order;
  *  - metric "cosine": score = -(dot / (|v|·|c|)), the `vecCosine`
  *    arithmetic;
  *  - ties break to the LOWER cell id (struct-ordering semantics of
  *    `least` / `array_sort`).
  */
case class CentroidTopCells(
    child: Expression,
    centroids: Array[Array[Float]],
    n: Int,
    useCosine: Boolean)
    extends UnaryExpression {

  require(centroids.nonEmpty, "empty centroid matrix")
  require(n >= 1 && n <= centroids.length, s"n=$n out of [1, ${centroids.length}]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_top_cells"

  // |c|² and |c| per centroid, computed once per plan (same evaluation
  // order as the literal path: Float→Double promotion per element)
  @transient private lazy val normSq: Array[Double] =
    centroids.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      s
    }
  @transient private lazy val norm: Array[Double] = normSq.map(math.sqrt)

  /** The per-row kernel; public so generated code can call it. */
  def compute(a: ArrayData): ArrayData = {
    val k = centroids.length
    val dim = a.numElements()
    // |v| only needed for cosine; matches vecNorm's accumulation order
    var vNormSq = 0.0
    if (useCosine) {
      var i = 0
      while (i < dim) { vNormSq += a.getFloat(i).toDouble * a.getFloat(i).toDouble; i += 1 }
    }
    val vNorm = math.sqrt(vNormSq)
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cen = centroids(c)
      val m = math.min(dim, cen.length)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += a.getFloat(i).toDouble * cen(i).toDouble; i += 1 }
      scores(c) =
        if (useCosine) -(dot / (vNorm * norm(c)))
        else dot * -2.0 + normSq(c)
      c += 1
    }
    if (n == 1) {
      // single-pass argmin — the assignment hot path
      var best = 0; var bestD = scores(0)
      var j = 1
      while (j < k) {
        if (java.lang.Double.compare(scores(j), bestD) < 0) { bestD = scores(j); best = j }
        j += 1
      }
      new GenericArrayData(Array(best))
    } else {
      val idx: Array[Integer] = Array.tabulate(k)(Integer.valueOf)
      java.util.Arrays.sort(idx, (x: Integer, y: Integer) => {
        val d = java.lang.Double.compare(scores(x), scores(y))
        if (d != 0) d else Integer.compare(x, y)
      })
      new GenericArrayData(idx.take(n).map(_.intValue(): Any))
    }
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the matrix rides as a referenced object — ONE constant-pool slot
    // regardless of nLists, vs one subtree per centroid in the literal
    // formulation
    val ref = ctx.addReferenceObj("centroidTopCells", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Residual of a vector against its assigned coarse centroid:
  * `vec − centroids[cell]`, elementwise as floats — the IVF-PQ
  * composition step (PQ codebooks quantize residuals, which are far
  * more concentrated than raw vectors, so equal code budgets buy more
  * precision). Same broadcast-matrix shape as [[CentroidTopCells]].
  */
case class CentroidResidual(
    left: Expression,
    right: Expression,
    centroids: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(centroids.nonEmpty, "empty centroid matrix")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_residual"

  def compute(a: ArrayData, cell: Int): ArrayData = {
    val cen = centroids(cell)
    val n = math.min(a.numElements(), cen.length)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = a.getFloat(i) - cen(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidResidual", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, c) => s"${ev.value} = $ref.compute($a, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CentroidFunctions {
  /** Column API for [[CentroidTopCells]]: the `n` nearest cell ids for
    * each vector, nearest first. `metric` is "l2" (assignment) or
    * "cosine" (probe ranking).
    */
  def centroidTopCells(
      vec: Column,
      centroids: Array[Array[Float]],
      n: Int,
      metric: String = "l2"): Column = {
    val useCosine = metric match {
      case "cosine" => true
      case "l2"     => false
      case other    => throw new IllegalArgumentException(s"unknown metric '$other'")
    }
    GraftShim.column(
      CentroidTopCells(GraftShim.expression(vec), centroids, n, useCosine))
  }

  /** Column API for [[CentroidResidual]]: vec − centroids[cell]. */
  def centroidResidual(
      vec: Column,
      cell: Column,
      centroids: Array[Array[Float]]): Column =
    GraftShim.column(CentroidResidual(
      GraftShim.expression(vec), GraftShim.expression(cell), centroids))
}
