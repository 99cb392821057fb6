package graft.functions

import java.nio.ByteBuffer
import java.util.PriorityQueue

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, If, IsNull, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

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

/** Shared KMV codec + estimator, factored so the VALUE-input aggregate
  * ([[KmvDistinct]]), the SKETCH-input aggregates ([[KmvSketch]],
  * [[KmvUnion]]), and the scalar reader ([[KmvEstimate]]) all agree on
  * the wire format: `int32 n` + `n` longs, hashes in UNSIGNED
  * ASCENDING order. Sorted emission matters beyond tidiness —
  * serialized sketches land in persisted state tables
  * ([[graft.ops.RollupStore]]) whose replay detection content-hashes
  * every column, so the bytes for a given hash SET must not depend on
  * heap-internal array order (which varies with partition/merge
  * order).
  */
object KmvCodec {
  def serialize(buf: KmvBuffer): Array[Byte] = {
    val hs = new Array[Long](buf.heap.size)
    var i = 0
    buf.heap.forEach { h => hs(i) = h.longValue(); i += 1 }
    // unsigned ascending == signed ascending after the sign-bit flip
    val keyed = hs.map(_ ^ Long.MinValue)
    java.util.Arrays.sort(keyed)
    val out = ByteBuffer.allocate(4 + hs.length * 8)
    out.putInt(hs.length)
    keyed.foreach(h => out.putLong(h ^ Long.MinValue))
    out.array()
  }

  def mergeInto(buf: KmvBuffer, bytes: Array[Byte]): Unit = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) { buf.insert(in.getLong); i += 1 }
  }

  def deserialize(bytes: Array[Byte], k: Int): KmvBuffer = {
    val buf = new KmvBuffer(k)
    mergeInto(buf, bytes)
    buf
  }

  /** The KMV estimate: exact below k, (k−1)/fraction at saturation. */
  def estimate(buf: KmvBuffer, k: Int): Long = {
    val n = buf.heap.size
    if (n < k) n.toLong
    else {
      val kth = buf.heap.peek().longValue()
      val fraction = (kth >>> 11).toDouble / (1L << 53).toDouble
      math.round((k - 1) / fraction)
    }
  }
}

/** KMV sketch BUILD aggregate — same accumulation as [[KmvDistinct]]
  * but `eval` emits the serialized buffer (BINARY) instead of the
  * estimate, turning the sketch into MERGEABLE STATE a table can
  * hold: a keyed rollup stores one sketch per key, later batches fold
  * in via [[KmvUnion]], and the estimate is read back with
  * [[KmvEstimate]] — the same partial/merge/finalize split Spark's
  * own datasketches trio (hll_sketch_agg / hll_union_agg /
  * hll_sketch_estimate) exposes, but with KMV's exact-below-k
  * property, which makes persisted-state pipelines oracle-checkable
  * against COUNT(DISTINCT) whenever per-key cardinality stays under
  * k.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, "KMV needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_sketch"

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

  override def eval(buf: KmvBuffer): Any = KmvCodec.serialize(buf)
  override def serialize(buf: KmvBuffer): Array[Byte] = KmvCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvCodec.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** KMV sketch UNION aggregate — input rows are serialized sketches
  * (BINARY, the [[KmvCodec]] format); the result is the serialized
  * union. Union of bottom-k sets is itself the bottom-k of the union,
  * so this loses nothing relative to sketching the raw values in one
  * pass — the property that lets a stored rollup fold in new batches
  * without ever rescanning old data. NULL inputs are skipped (an
  * absent sketch contributes no hashes).
  */
case class KmvUnion(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, "KMV needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_union"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) KmvCodec.mergeInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    b.heap.forEach(h => a.insert(h))
    a
  }

  override def eval(buf: KmvBuffer): Any = KmvCodec.serialize(buf)
  override def serialize(buf: KmvBuffer): Array[Byte] = KmvCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvCodec.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar reader for a serialized KMV sketch: BINARY → the distinct
  * estimate (LONG). Evaluated once per OUTPUT row at finalize time —
  * never in a per-input-row hot path — so CodegenFallback costs
  * nothing measurable.
  */
case class KmvEstimate(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2, "KMV needs k >= 2")
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_estimate"
  override protected def nullSafeEval(input: Any): Any =
    KmvCodec.estimate(
      KmvCodec.deserialize(input.asInstanceOf[Array[Byte]], k), k)
  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
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

  /** Aggregate a raw column into a serialized KMV sketch (BINARY) —
    * mergeable distinct-count STATE for persisted rollups. Same
    * null/hash discipline as [[kmvDistinct]].
    */
  def kmvSketch(col: Column, k: Int = 256): Column = {
    val raw = GraftShim.expression(col)
    val hashed = If(IsNull(raw), Literal(null, LongType), XxHash64(Seq(raw), 42L))
    GraftShim.column(KmvSketch(hashed, k).toAggregateExpression())
  }

  /** Merge serialized KMV sketches into one (BINARY → BINARY).
    * `k` must match the k the sketches were built with.
    */
  def kmvUnion(col: Column, k: Int = 256): Column =
    GraftShim.column(KmvUnion(GraftShim.expression(col), k).toAggregateExpression())

  /** Read the distinct estimate out of a serialized KMV sketch. */
  def kmvEstimate(col: Column, k: Int = 256): Column =
    GraftShim.column(KmvEstimate(GraftShim.expression(col), k))
}
