package graft.functions

import java.nio.ByteBuffer
import java.util.PriorityQueue

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.types.{DataType, LongType}

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
  * `child` must be a LONG hash column; the public API
  * [[SketchFunctions.kmvDistinct]] wraps any column in `xxhash64`.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[java.lang.Long]] {

  require(k >= 2, "KMV needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  // max-heap on unsigned order: head is the LARGEST of the k kept
  // minima, so a better (smaller) candidate evicts it in O(log k)
  private def newHeap(): PriorityQueue[java.lang.Long] =
    new PriorityQueue[java.lang.Long](
      k, (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(b, a))

  override def createAggregationBuffer(): PriorityQueue[java.lang.Long] = newHeap()

  private def insert(heap: PriorityQueue[java.lang.Long], h: Long): Unit = {
    if (heap.size < k) {
      if (!heap.contains(h)) heap.add(h)
    } else if (java.lang.Long.compareUnsigned(h, heap.peek()) < 0 && !heap.contains(h)) {
      heap.poll()
      heap.add(h)
    }
  }

  override def update(
      heap: PriorityQueue[java.lang.Long], input: InternalRow): PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(
      a: PriorityQueue[java.lang.Long], b: PriorityQueue[java.lang.Long]): PriorityQueue[java.lang.Long] = {
    b.forEach(h => insert(a, h))
    a
  }

  override def eval(heap: PriorityQueue[java.lang.Long]): Any = {
    val n = heap.size
    if (n < k) n.toLong
    else {
      // k-th minimum = heap head (largest kept); scale unsigned to [0,1)
      val kth = heap.peek().longValue()
      val fraction = (kth >>> 11).toDouble / (1L << 53).toDouble
      math.round((k - 1) / fraction)
    }
  }

  override def serialize(heap: PriorityQueue[java.lang.Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + heap.size * 8)
    buf.putInt(heap.size)
    heap.forEach(h => buf.putLong(h))
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[java.lang.Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = newHeap()
    var i = 0
    while (i < n) { heap.add(buf.getLong); i += 1 }
    heap
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
  /** Approximate COUNT(DISTINCT col) via the KMV bottom-k sketch. */
  def kmvDistinct(col: Column, k: Int = 256): Column =
    GraftShim.column(
      KmvDistinct(XxHash64(Seq(GraftShim.expression(col)), 42L), k)
        .toAggregateExpression())
}
