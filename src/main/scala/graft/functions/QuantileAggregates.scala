package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Mergeable quantile state: an exact value histogram that degrades to
  * a log-binned one under cardinality pressure — the HdrHistogram idea
  * (exponential buckets, bounded RELATIVE error) expressed as a
  * shift-truncation of the order-preserving IEEE-754 bit image.
  *
  * State = (shift, key → count). At shift 0 keys are full sortable
  * double bits — counts are an EXACT value histogram and every
  * quantile is exact (the regime the DuckDB oracle checks). When the
  * map would exceed `maxBins` distinct keys, the shift grows (42, then
  * +4 steps): keys truncate to their top bits — sign, exponent, and a
  * mantissa prefix — so each bin spans values within a bounded RATIO
  * (≈ 2^-10 relative width at shift 42 for normal doubles), and a
  * quantile read returns its bin's lower bound: never above the true
  * quantile, within one bin's ratio below it.
  *
  * Every piece is a pure function of the value MULTISET:
  * bin_s(bin_t(x)) = bin_s(x) for s ≥ t (truncation composes), counts
  * are sums, and the shift settles at the minimal resolution the total
  * multiset fits in — so the state is MERGE-ORDER-INDEPENDENT, unlike
  * a Misra-Gries summary, and may safely participate in content-keyed
  * replay detection.
  */
final class QBuffer(val maxBins: Int) {
  var shift: Int = 0
  val counts = new java.util.HashMap[java.lang.Long, Long]

  def insertValue(d: Double): Unit =
    insertKey(QCodec.binAt(QCodec.sortable(d), shift), 1L)

  def insertKey(key: Long, c: Long): Unit = {
    val boxed = java.lang.Long.valueOf(key)
    val cur = counts.get(boxed)
    counts.put(boxed, (if (counts.containsKey(boxed)) cur else 0L) + c)
    if (counts.size > maxBins) coarsen()
  }

  /** Grow the shift until the bins fit — minimal sufficient
    * resolution, which is what makes the final state order-free.
    */
  private def coarsen(): Unit = {
    while (counts.size > maxBins) {
      val next = if (shift == 0) 42 else shift + 4
      val re = new java.util.HashMap[java.lang.Long, Long](counts.size)
      counts.forEach { (k, c) =>
        val nk = java.lang.Long.valueOf(QCodec.binAt(k << shift, next))
        val cur = re.get(nk)
        re.put(nk, (if (re.containsKey(nk)) cur else 0L) + c)
      }
      counts.clear()
      counts.putAll(re)
      shift = next
    }
  }

  def mergeFrom(other: QBuffer): Unit = {
    // align to the coarser resolution first; truncation composes
    val target = math.max(shift, other.shift)
    if (shift < target) { val s = shift; shift = target; rebinFrom(s) }
    other.counts.forEach { (k, c) =>
      insertKey(QCodec.binAt(k << other.shift, shift), c)
    }
  }

  private def rebinFrom(oldShift: Int): Unit = {
    val re = new java.util.HashMap[java.lang.Long, Long](counts.size)
    counts.forEach { (k, c) =>
      val nk = java.lang.Long.valueOf(QCodec.binAt(k << oldShift, shift))
      val cur = re.get(nk)
      re.put(nk, (if (re.containsKey(nk)) cur else 0L) + c)
    }
    counts.clear()
    counts.putAll(re)
  }
}

object QCodec {
  /** Order-preserving bit image under SIGNED long comparison:
    * sortable(a) < sortable(b) ⇔ a < b (IEEE total order). Positive
    * doubles keep their bits (already ascending, non-negative);
    * negative doubles flip their magnitude bits so their natural
    * descending bit order reverses while the sign bit keeps them
    * below every positive. Signed monotonicity is what lets bins
    * truncate with arithmetic shift and sort with plain Long order.
    */
  def sortable(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    if (b >= 0) b else b ^ 0x7fffffffffffffffL
  }

  def unsortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(
      if (s >= 0) s else s ^ 0x7fffffffffffffffL)

  def binAt(sortableBits: Long, shift: Int): Long =
    if (shift == 0) sortableBits else sortableBits >> shift

  def serialize(buf: QBuffer): Array[Byte] = {
    val keys = new Array[Long](buf.counts.size)
    var i = 0
    val it = buf.counts.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    val out = ByteBuffer.allocate(8 + keys.length * 16)
    out.putInt(buf.shift)
    out.putInt(keys.length)
    keys.foreach { k => out.putLong(k); out.putLong(buf.counts.get(k)) }
    out.array()
  }

  def deserialize(bytes: Array[Byte], maxBins: Int): QBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val buf = new QBuffer(maxBins)
    buf.shift = in.getInt
    val n = in.getInt
    var i = 0
    while (i < n) {
      buf.counts.put(java.lang.Long.valueOf(in.getLong), in.getLong)
      i += 1
    }
    buf
  }

  /** Rank-q read: the value (bin lower bound; exact value at shift 0)
    * at rank ⌈q·N⌉ — percentile_disc semantics, reproducible in plain
    * window SQL. Null for an empty sketch.
    */
  def quantile(buf: QBuffer, q: Double): Any = {
    var n = 0L
    buf.counts.forEach((_, c) => n += c)
    if (n == 0) return null
    val rank = math.max(1L, math.ceil(q * n).toLong)
    val keys = new Array[Long](buf.counts.size)
    var i = 0
    val it = buf.counts.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    var cum = 0L
    i = 0
    while (i < keys.length) {
      cum += buf.counts.get(keys(i))
      if (cum >= rank) return unsortable(keys(i) << buf.shift)
      i += 1
    }
    unsortable(keys(keys.length - 1) << buf.shift)
  }
}

/** Quantile sketch BUILD aggregate: DOUBLE child → serialized state
  * (BINARY). NULLs skipped.
  */
case class QSketch(
    child: Expression,
    maxBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QBuffer] {

  require(maxBins >= 16, "quantile sketch needs maxBins >= 16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "q_sketch"

  override def createAggregationBuffer(): QBuffer = new QBuffer(maxBins)

  override def update(buf: QBuffer, input: InternalRow): QBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insertValue(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: QBuffer, b: QBuffer): QBuffer = { a.mergeFrom(b); a }
  override def eval(buf: QBuffer): Any = QCodec.serialize(buf)
  override def serialize(buf: QBuffer): Array[Byte] = QCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QBuffer =
    QCodec.deserialize(bytes, maxBins)

  override def withNewMutableAggBufferOffset(newOffset: Int): QSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Quantile sketch UNION aggregate: serialized states in, combined
  * state out — the rollup fold.
  */
case class QUnion(
    child: Expression,
    maxBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QBuffer] {

  require(maxBins >= 16, "quantile sketch needs maxBins >= 16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "q_union"

  override def createAggregationBuffer(): QBuffer = new QBuffer(maxBins)

  override def update(buf: QBuffer, input: InternalRow): QBuffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeFrom(
      QCodec.deserialize(v.asInstanceOf[Array[Byte]], maxBins))
    buf
  }

  override def merge(a: QBuffer, b: QBuffer): QBuffer = { a.mergeFrom(b); a }
  override def eval(buf: QBuffer): Any = QCodec.serialize(buf)
  override def serialize(buf: QBuffer): Array[Byte] = QCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QBuffer =
    QCodec.deserialize(bytes, maxBins)

  override def withNewMutableAggBufferOffset(newOffset: Int): QUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar rank-q reader of a serialized quantile sketch —
  * finalize-time only.
  */
case class QQuantile(child: Expression, maxBins: Int, q: Double)
    extends UnaryExpression with CodegenFallback {
  require(q >= 0.0 && q <= 1.0, "quantile must be in [0, 1]")
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "q_quantile"
  override protected def nullSafeEval(input: Any): Any =
    QCodec.quantile(
      QCodec.deserialize(input.asInstanceOf[Array[Byte]], maxBins), q)
  override protected def withNewChildInternal(newChild: Expression): QQuantile =
    copy(child = newChild)
}

object QuantileFunctions {
  /** Aggregate a numeric column into mergeable quantile state
    * (BINARY). Values go in as doubles; NULLs skipped.
    */
  def qSketch(col: Column, maxBins: Int = 512): Column = {
    val raw = GraftShim.expression(col)
    GraftShim.column(QSketch(Cast(raw, DoubleType), maxBins).toAggregateExpression())
  }

  /** Merge serialized quantile states (BINARY → BINARY). */
  def qUnion(col: Column, maxBins: Int = 512): Column =
    GraftShim.column(QUnion(GraftShim.expression(col), maxBins).toAggregateExpression())

  /** Rank-q value of a serialized state (exact below maxBins distinct
    * values; bin lower bound beyond).
    */
  def qQuantile(col: Column, q: Double, maxBins: Int = 512): Column =
    GraftShim.column(QQuantile(GraftShim.expression(col), maxBins, q))
}
