package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional file-
  * skipping layout (the technique behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`, public literature since Orenstein & Merrett 1984).
  *
  * A table range-partitioned and sorted on ONE column skips files
  * only for predicates on that column; every other column's values
  * spray across all files and their min/max stats prune nothing.
  * Interleaving the bits of several columns' normalized ranks orders
  * rows along a space-filling curve, so every participating column is
  * APPROXIMATELY clustered: each file covers a small hyper-rectangle,
  * its per-column min/max ranges are narrow, and parquet row-group /
  * file stats prune scans filtering on ANY of the columns.
  *
  * Normalization is min/max scaling to `bits`-bit ranks — two
  * deterministic passes (one tiny min/max aggregate, then the map).
  * Rank-based (quantile) scaling resists skew better but costs an
  * approximate-quantile pass; min/max is the right default for the
  * mostly-uniform key domains of warehouse ids, and the whole
  * computation is plain arithmetic an oracle can replicate.
  */
object ZOrder {

  /** The interleaved z-value of the given pre-scaled `bits`-bit rank
    * columns: bit i of rank j lands at position i·n + j. Pure integer
    * arithmetic (shift/mask/sum), codegen-friendly, no UDF.
    */
  private[ops] def interleave(ranks: Seq[Column], bits: Int): Column = {
    require(ranks.nonEmpty && bits * ranks.size <= 63,
      s"${ranks.size} columns at $bits bits exceed a signed long")
    val n = ranks.size
    (0 until bits).flatMap { i =>
      ranks.zipWithIndex.map { case (r, j) =>
        // bit i of rank j → output bit i*n + j
        shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ + _)
  }

  /** `bits`-bit min/max rank of a numeric column given its global
    * (min, max): floor((v − min) / (max − min) · (2^bits − 1)),
    * constant 0 when the column is constant.
    */
  private[ops] def rankOf(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val span = mx.cast("double") - mn.cast("double")
    when(span === 0.0, lit(0L)).otherwise(
      floor((c.cast("double") - mn.cast("double")) / span *
        ((1L << bits) - 1).toDouble).cast("long"))
  }

  /** Add the z-value of `cols` as `zCol` (default `__z`). Two passes:
    * one broadcastable min/max aggregate row, then the arithmetic
    * map — no shuffle of the data itself.
    */
  def withZValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 16,
      zCol: String = "__z"): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val ranks = cols.map(c =>
      rankOf(col(c), col(s"__mn_$c"), col(s"__mx_$c"), bits))
    joined
      .withColumn(zCol, interleave(ranks, bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Cluster `df` for writing: range-partition on the z-value into
    * `numPartitions` output slices and sort within each — every
    * written file then covers one tight z-range, i.e. one small
    * hyper-rectangle of the participating columns. The z column is
    * dropped; the LAYOUT is the product. At 100 TB this is the
    * standard periodic re-layout job: one range shuffle of the data,
    * after which every consumer's selective scans skip.
    */
  def cluster(
      df: DataFrame,
      cols: Seq[String],
      numPartitions: Int,
      bits: Int = 16): DataFrame = {
    val z = withZValue(df, cols, bits)
    z.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
