package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All reads go through here so that scan-level concerns (column pruning,
  * predicate pushdown) are uniform: we always hand Catalyst a plain
  * parquet relation and let it push filters/projections into the scan.
  * At cluster scale the same API would point at partitioned table roots;
  * nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet has shipped with two physical types for `ts`:
    * TIMESTAMP(NANOS) (rejected by Spark's parquet reader unless
    * `spark.sql.legacy.parquet.nanosAsLong` is set, in which case it
    * loads as LongType) and standard TIMESTAMP(MICROS). Adapt to
    * whichever the file actually stores instead of assuming one:
    *   - nanos-as-long → truncate ns → µs (integer `div`, matching
    *     DuckDB's truncation) and build a timestamp;
    *   - µs without UTC flag loads as TIMESTAMP_NTZ → cast to the
    *     session-zoned TimestampType (sessions run UTC, so the cast
    *     is value-preserving) so every downstream consumer sees the
    *     same dtype regardless of the upstream writer's choice.
    * The legacy conf is only touched when a nanos file is actually
    * encountered — a µs file never perturbs session config.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val path = s"$d/events.parquet"
    val raw =
      try s.read.parquet(path)
      catch {
        // TIMESTAMP(NANOS) columns fail schema inference unless the
        // legacy nanos-as-long read is on; enable it and retry. The
        // conf must stay set for the scan itself to execute later.
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("NANOS") || e.getMessage.toLowerCase.contains("illegal parquet type") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          s.read.parquet(path)
      }
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
