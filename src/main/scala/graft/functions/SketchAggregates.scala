package graft.functions

import java.nio.ByteBuffer
import java.util.PriorityQueue

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, If, IsNull, Literal, XxHash64}
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV aggregation buffer: max-heap (unsigned order) of the k smallest
  * hashes plus a membership HashSet so duplicate detection is O(1)
  * instead of an O(k) `PriorityQueue.contains` scan per accepted
  * candidate. Deduplication is not optional bookkeeping: in the exact
  * regime (fewer than k distinct hashes) the heap size IS the answer,
  * and in the estimating regime a duplicated value among the k minima
  * would shift the k-th order statistic.
  */
final class KmvBuffer(val k: Int) {
  val heap: PriorityQueue[java.lang.Long] =
    new PriorityQueue[java.lang.Long](
      k, (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(b, a))
  val seen: java.util.HashSet[java.lang.Long] = new java.util.HashSet[java.lang.Long](2 * k)

  def insert(h: Long): Unit = {
    if (!seen.contains(h)) {
      if (heap.size < k) {
        heap.add(h); seen.add(h)
      } else if (java.lang.Long.compareUnsigned(h, heap.peek()) < 0) {
        seen.remove(heap.poll())
        heap.add(h); seen.add(h)
      }
    }
  }
}

/** KMV (k-minimum-values) distinct-count sketch as a real
  * `TypedImperativeAggregate` — the custom-sketch extension point:
  * partial buffers on executors, binary `serialize`/`merge` across
  * the shuffle, constant memory (k longs) regardless of cardinality.
  *
  * The estimator: keep the k smallest 64-bit hash values; if fewer
  * than k distinct hashes were seen the count is exact (their
  * number); otherwise distinct ≈ (k−1) / fraction, where fraction is
  * the k-th minimum scaled to [0,1) — the classic KMV/bottom-k
  * estimator (RSE ≈ 1/√(k−2)). Deterministic for a fixed input set:
  * no sampling, just order statistics of xxhash64.
  *
  * `child` must be a nullable LONG hash column; NULL children are
  * skipped, matching COUNT(DISTINCT) semantics (which ignores nulls).
  * The public API [[SketchFunctions.kmvDistinct]] wraps any column as
  * `IF(ISNULL(x), NULL, xxhash64(x))` — the null test must happen on
  * the RAW value because XxHash64 itself never returns null (a null
  * input hashes to the seed, which would count as one phantom
  * distinct value).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, "KMV needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    b.heap.forEach(h => a.insert(h))
    a
  }

  override def eval(buf: KmvBuffer): Any = {
    val n = buf.heap.size
    if (n < k) n.toLong
    else {
      // k-th minimum = heap head (largest kept); scale unsigned to [0,1)
      val kth = buf.heap.peek().longValue()
      val fraction = (kth >>> 11).toDouble / (1L << 53).toDouble
      math.round((k - 1) / fraction)
    }
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + buf.heap.size * 8)
    out.putInt(buf.heap.size)
    buf.heap.forEach(h => out.putLong(h))
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.insert(in.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SketchFunctions {
  /** Approximate COUNT(DISTINCT col) via the KMV bottom-k sketch.
    * NULLs are ignored (COUNT(DISTINCT) semantics) — see the null
    * discussion on [[KmvDistinct]].
    */
  def kmvDistinct(col: Column, k: Int = 256): Column = {
    val raw = GraftShim.expression(col)
    val hashed = If(IsNull(raw), Literal(null, LongType), XxHash64(Seq(raw), 42L))
    GraftShim.column(KmvDistinct(hashed, k).toAggregateExpression())
  }
}
