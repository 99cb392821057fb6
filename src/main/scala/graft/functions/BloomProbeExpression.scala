package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** `might_contain` over a PER-ROW bloom column, keyed by cell — the
  * executor-side half of the ANN index id-bloom probe.
  *
  * Spark's own `BloomFilterMightContain` requires its filter argument
  * to be a foldable literal/scalar-subquery, which forces the caller
  * to merge every touched cell's bloom in DRIVER memory and ship one
  * blob (the r6 driver bound: touched-cells × 1.2 MB). This expression
  * instead evaluates after a `batch ⋈ sidecar ON cell` join, where
  * each row carries its OWN cell's serialized bloom: deserialization
  * is cached per cell (a per-row 1.2 MB parse would dwarf the probe),
  * so each task pays one parse per cell it sees and a map lookup per
  * row. The join is the scale story — Catalyst broadcasts a small
  * sidecar slice and shuffles a wide one, and no bloom bytes ever
  * aggregate on the driver.
  *
  * Null semantics: a NULL bloom means the cell has no sidecar row —
  * no prior ids, so "might contain" is definitively false (never
  * null); same for a NULL cell or hash. Output is non-nullable, which
  * keeps the downstream suspect/novel split a plain boolean filter.
  */
case class CellBloomMightContain(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "cell_bloom_might_contain"

  // one deserialized filter per cell per expression instance (≈ per
  // task binary); bounded so a degenerate many-cell task cannot pin
  // unbounded heap — eviction only costs a re-parse
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, org.apache.spark.util.sketch.BloomFilter]()

  def probe(cell: Int, bloom: Array[Byte], hash: Long): Boolean = {
    if (cache.size > 64) cache.clear()
    cache.computeIfAbsent(cell, _ =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloom)))
      .mightContainLong(hash)
  }

  override def eval(input: InternalRow): Any = {
    val bloom = second.eval(input)
    if (bloom == null) false
    else {
      val cell = first.eval(input)
      val hash = third.eval(input)
      if (cell == null || hash == null) false
      else probe(
        cell.asInstanceOf[Int],
        bloom.asInstanceOf[Array[Byte]],
        hash.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellBloomProbe", this, classOf[CellBloomMightContain].getName)
    val cellGen = first.genCode(ctx)
    val bloomGen = second.genCode(ctx)
    val hashGen = third.genCode(ctx)
    ev.copy(
      code = code"""
        ${cellGen.code}
        ${bloomGen.code}
        ${hashGen.code}
        boolean ${ev.value} = false;
        if (!${bloomGen.isNull} && !${cellGen.isNull} && !${hashGen.isNull}) {
          ${ev.value} = $ref.probe(${cellGen.value}, ${bloomGen.value}, ${hashGen.value});
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Merge two serialized spark `BloomFilter`s into one — the
  * executor-side half of the sidecar UPDATE: per-cell add-blooms fold
  * into stored blooms where the rows sit, so the update (like the
  * probe) never aggregates bloom bytes on the driver. Null-intolerant;
  * the caller routes the no-stored-bloom case around it with a
  * `when(isNull, add)`. Parameter incompatibility is checked
  * RELATIONALLY by the caller against the sidecar's declared
  * (capacity, num_bits) columns before this runs; bytes that still
  * fail to merge (out-of-contract writes) fail the task loudly —
  * never a silent drop, which would let later batches re-append
  * landed ids.
  */
case class BloomMerge(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_merge"

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(a))
    fa.mergeInPlace(org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(b)))
    val bos = new java.io.ByteArrayOutputStream()
    fa.writeTo(bos)
    bos.toByteArray
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    merge(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMerge", this, classOf[BloomMerge].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.merge($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** True when the serialized bloom might contain ANY of an array of
  * xxhash64 values — the per-file bloom-index probe
  * ([[graft.ops.BloomFileIndex]]). Unlike [[CellBloomMightContain]]
  * this parses the filter per ROW, which is exactly right for its
  * use: the index holds ONE row per file and each row is probed once
  * per query, so a cache would never hit (and a shared cache keyed by
  * anything file-derived risks collisions returning the wrong
  * filter). The hash array is typically constant-folded literals.
  */
case class BloomMightContainAny(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain_any"

  def probeAny(bloom: Array[Byte], hashes: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloom))
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (bf.mightContainLong(hashes.getLong(i))) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    probeAny(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomAnyProbe", this, classOf[BloomMightContainAny].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.probeAny($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomProbeFunctions {
  /** True when `bloom` (the row's cell sidecar filter, NULL = no prior
    * ids) might contain `hash`; see [[CellBloomMightContain]].
    */
  def cellBloomMightContain(cell: Column, bloom: Column, hash: Column): Column =
    GraftShim.column(CellBloomMightContain(
      GraftShim.expression(cell), GraftShim.expression(bloom), GraftShim.expression(hash)))

  /** Any-of probe of a serialized bloom against an `array<long>` of
    * xxhash64 values; see [[BloomMightContainAny]].
    */
  def bloomMightContainAny(bloom: Column, hashes: Column): Column =
    GraftShim.column(BloomMightContainAny(
      GraftShim.expression(bloom), GraftShim.expression(hashes)))

  /** Union of two serialized blooms (same parameters); see [[BloomMerge]]. */
  def bloomMerge(a: Column, b: Column): Column =
    GraftShim.column(BloomMerge(GraftShim.expression(a), GraftShim.expression(b)))
}
