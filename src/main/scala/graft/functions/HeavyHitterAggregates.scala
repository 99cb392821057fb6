package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters buffer: at most `k` (key → counter)
  * entries. The classic guarantee: every key's true count is
  * overestimated by nothing and underestimated by at most N/(k+1) —
  * and when a group holds ≤ k distinct keys NO decrement ever fires,
  * so the counters are EXACT (the property the DuckDB oracle checks,
  * mirroring KMV's exact-below-k regime).
  */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long](2 * k)

  def insert(key: String, by: Long = 1L): Unit = {
    val cur = counts.get(key)
    if (cur != 0L || counts.containsKey(key)) counts.put(key, cur + by)
    else if (counts.size < k) counts.put(key, by)
    else {
      // Misra-Gries decrement: all counters down by `by` (the batch
      // weight), dropping the non-positive. Amortized O(1) per unit of
      // weight — each decrement round is paid for by the increments
      // that preceded it.
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - by
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS'12): sum
    * counters keywise, then if over capacity reduce every counter by
    * the (k+1)-th largest and drop the non-positive — the result
    * carries the SUM of both sides' error bounds, still ≤ N/(k+1).
    */
  def mergeFrom(other: MgBuffer): Unit = {
    other.counts.forEach { (key, c) =>
      val cur = counts.get(key)
      if (cur != 0L || counts.containsKey(key)) counts.put(key, cur + c)
      else counts.put(key, c)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - cut
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
  }
}

/** Wire codec + reader, shared by the build/union aggregates and the
  * scalar readers. Entries serialize SORTED BY KEY so the bytes for a
  * given counter set are independent of hash-map iteration order —
  * serialized sketches land in persisted rollup state whose replay
  * detection content-hashes columns (exact-regime sketches are
  * deterministic; saturated ones depend on merge order, which is why
  * [[graft.ops.RollupStore]] keeps them OUT of its content key).
  */
object MgCodec {
  def serialize(buf: MgBuffer): Array[Byte] = {
    val keys = new Array[String](buf.counts.size)
    var i = 0
    val kit = buf.counts.keySet().iterator()
    while (kit.hasNext) { keys(i) = kit.next(); i += 1 }
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    val enc = keys.map(_.getBytes(StandardCharsets.UTF_8))
    val out = ByteBuffer.allocate(4 + enc.map(_.length + 12).sum)
    out.putInt(keys.length)
    keys.indices.foreach { j =>
      out.putInt(enc(j).length)
      out.put(enc(j))
      out.putLong(buf.counts.get(keys(j)))
    }
    out.array()
  }

  def mergeInto(buf: MgBuffer, bytes: Array[Byte]): Unit = {
    val other = deserialize(bytes, buf.k)
    buf.mergeFrom(other)
  }

  def deserialize(bytes: Array[Byte], k: Int): MgBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(k)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), in.getLong)
      i += 1
    }
    buf
  }

  /** Entries ranked (count desc, key asc) — the deterministic read
    * order both the oracle and any consumer can reproduce.
    */
  def ranked(buf: MgBuffer): Array[(String, Long)] = {
    val arr = new Array[(String, Long)](buf.counts.size)
    var i = 0
    buf.counts.forEach { (key, c) => arr(i) = (key, c); i += 1 }
    scala.util.Sorting.stableSort(arr,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    arr
  }
}

/** Heavy-hitter sketch BUILD aggregate: STRING child → serialized
  * Misra-Gries counter set (BINARY) — mergeable top-k-by-frequency
  * STATE, the frequency twin of [[KmvSketch]]. NULLs are skipped.
  */
case class MgSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  require(k >= 1, "Misra-Gries needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_sketch"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.toString)
    buf
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = { a.mergeFrom(b); a }
  override def eval(buf: MgBuffer): Any = MgCodec.serialize(buf)
  override def serialize(buf: MgBuffer): Array[Byte] = MgCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgCodec.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Heavy-hitter sketch UNION aggregate: serialized sketches in,
  * serialized combined sketch out — how a persisted rollup folds a
  * batch's partial counters into stored state without rescanning it.
  */
case class MgUnion(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  require(k >= 1, "Misra-Gries needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_union"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val ev = child.eval(input)
    if (ev != null) MgCodec.mergeInto(buf, ev.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = { a.mergeFrom(b); a }
  override def eval(buf: MgBuffer): Any = MgCodec.serialize(buf)
  override def serialize(buf: MgBuffer): Array[Byte] = MgCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgCodec.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar readers for a serialized Misra-Gries sketch — finalize-time
  * only, so CodegenFallback costs nothing measurable. Entries rank
  * (count desc, key asc); `j` caps the emitted prefix.
  */
case class MgTopKeys(child: Expression, k: Int, j: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_top_keys"
  override protected def nullSafeEval(input: Any): Any = {
    val ranked = MgCodec.ranked(
      MgCodec.deserialize(input.asInstanceOf[Array[Byte]], k))
    new GenericArrayData(
      ranked.take(j).map(e => UTF8String.fromString(e._1)).toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): MgTopKeys =
    copy(child = newChild)
}

case class MgTopCounts(child: Expression, k: Int, j: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "mg_top_counts"
  override protected def nullSafeEval(input: Any): Any = {
    val ranked = MgCodec.ranked(
      MgCodec.deserialize(input.asInstanceOf[Array[Byte]], k))
    new GenericArrayData(ranked.take(j).map(e => java.lang.Long.valueOf(e._2)).toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): MgTopCounts =
    copy(child = newChild)
}

object HeavyHitterFunctions {
  /** Aggregate a column into a serialized Misra-Gries heavy-hitter
    * sketch (BINARY). Values are tracked as their STRING rendering
    * (cast once here), so any key type participates; NULLs skipped.
    * Exact whenever the group holds ≤ k distinct values.
    */
  def mgSketch(col: Column, k: Int = 256): Column = {
    val raw = GraftShim.expression(col)
    GraftShim.column(MgSketch(Cast(raw, StringType), k).toAggregateExpression())
  }

  /** Merge serialized Misra-Gries sketches (BINARY → BINARY). `k`
    * must match the build k.
    */
  def mgUnion(col: Column, k: Int = 256): Column =
    GraftShim.column(MgUnion(GraftShim.expression(col), k).toAggregateExpression())

  /** Top-`j` keys of a serialized sketch, (count desc, key asc). */
  def mgTopKeys(col: Column, k: Int = 256, j: Int = 10): Column =
    GraftShim.column(MgTopKeys(GraftShim.expression(col), k, j))

  /** Counters aligned with [[mgTopKeys]]. */
  def mgTopCounts(col: Column, k: Int = 256, j: Int = 10): Column =
    GraftShim.column(MgTopCounts(GraftShim.expression(col), k, j))
}
