package graft.ops

import org.apache.spark.sql.types._

/** The LOSSLESS type-widening allowlist shared by the single-table
  * `ALTER TABLE … ALTER COLUMN TYPE` (plans/GraftDdl) and the
  * per-table DbLog form ([[DbLog.alterColumnType]]): retypes a
  * pin serves NATIVELY from old parquet footers — probed against both
  * Spark 4 parquet readers (vectorized and row-based; SPARK-44362
  * type-widening support) — so the evolution is metadata-only, no
  * file rewritten.
  */
object TypeWidening {

  /** Integral up-widening, integral→double, float→double,
    * date→timestamp_ntz, and decimal growth that shrinks neither the
    * scale nor the integer digits.
    */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case (FloatType, DoubleType) => true
    case (DateType, TimestampNTZType) => true
    case (d1: DecimalType, d2: DecimalType) =>
      val (p, s, p2, s2) = (d1.precision, d1.scale, d2.precision, d2.scale)
      s2 >= s && (p2 - s2) >= (p - s) && (p2 > p || s2 > s)
    case _ => false
  }

  /** The refusal message both surfaces spell. */
  def refuse(name: String, from: DataType, to: DataType): String =
    s"ALTER COLUMN $name: ${from.simpleString} -> ${to.simpleString} " +
      "is not a lossless widening the parquet reader serves (integral " +
      "up-widening, integral/float -> double, date -> timestamp_ntz, " +
      "decimal growth)"
}
