package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomProbeFunctions

/** Per-file bloom index: the POINT-lookup complement of [[ZoneMap]]'s
  * range manifest — the same role Delta's bloom-filter index or
  * Parquet's own column blooms play. Zone maps prune when the layout
  * clusters the column (min/max spans are narrow); a bloom index
  * prunes equality probes on a HIGH-CARDINALITY column regardless of
  * layout — "which files hold order 123456" on a table laid out by
  * date — where every file's min/max straddles the probe value and
  * zone maps keep everything.
  *
  * Index shape: one row per file — (file, n_rows, bloom, capacity,
  * num_bits). Build is one column-pruned scan, aggregated per file
  * with Spark's BloomFilterAggregate (the same kernel as the ANN
  * id-bloom sidecars, map-side partials, no driver fold). Size the
  * capacity to rows-per-file: numBits/8 bytes per file (~1.2 MB at
  * the 2^20/1% default) — a ~1% overhead beside a 128 MB file.
  *
  * Probe discipline at 100 TB: the index DataFrame is never collected
  * whole. [[candidateStatus]] evaluates the bloom probes on EXECUTORS
  * (one parse per file row) and collects only (file, hit) booleans —
  * kilobytes for 10⁵ files — then the driver assembles the candidate
  * list: bloom-negative files are skipped (no false negatives by
  * bloom contract), unknown files (no index row) are always read.
  * The residual `isin` filter still runs over the survivors — the
  * index is necessary, never trusted as sufficient.
  *
  * Hash contract: values are hashed with `xxhash64` of the column's
  * NATIVE type at build time; probe literals must carry the same type
  * (a LongType build probed with an int literal hashes differently
  * and silently keeps nothing but unknowns).
  */
object BloomFileIndex {

  /** Build the index for `column` over the parquet files under `dir`. */
  def build(
      spark: SparkSession,
      dir: String,
      column: String,
      expectedPerFile: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame =
    buildForFiles(spark, TxLog.dataInputFiles(spark, dir),
      TxLog.read(spark, dir).schema, column, expectedPerFile, fpp)

  private def buildForFiles(
      spark: SparkSession,
      files: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      column: String,
      expectedPerFile: Long,
      fpp: Double): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .create(expectedPerFile, fpp).bitSize()
    val src =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    val agg = org.apache.spark.sql.GraftShim.column(
      org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        org.apache.spark.sql.GraftShim.expression(xxhash64(col(column))),
        Literal(expectedPerFile), Literal(numBits), 0, 0)
        .toAggregateExpression())
    src
      .select(input_file_name().as("file"), col(column))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"), agg.as("bloom"))
      .withColumn("capacity", lit(expectedPerFile))
      .withColumn("num_bits", lit(numBits))
  }

  /** One-scan combined build: the bloom index for `bloomCol` AND a
    * [[ZoneMap]]-format manifest for `statsCols`, from a single pass
    * over the data. A fresh layout job that wants both indexes
    * (Z-order write → zone map for ranges, bloom for point probes)
    * pays one scan instead of footers + a data scan; the returned
    * manifest is consumable by [[ZoneMap.candidateFiles]]/
    * [[ZoneMap.prunedRead]] unchanged.
    */
  def buildWithStats(
      spark: SparkSession,
      dir: String,
      bloomCol: String,
      statsCols: Seq[String],
      expectedPerFile: Long = 1L << 20,
      fpp: Double = 0.01): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .create(expectedPerFile, fpp).bitSize()
    val agg = org.apache.spark.sql.GraftShim.column(
      org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        org.apache.spark.sql.GraftShim.expression(xxhash64(col(bloomCol))),
        Literal(expectedPerFile), Literal(numBits), 0, 0)
        .toAggregateExpression())
    // Long mins/maxes above 2^53 round to the nearest double on the
    // cast; a max that rounded DOWN under-reports the span and the
    // manifest would wrongly prune — ZoneMap.boundToDouble's
    // footer-side fix, restated in SQL via ZoneMap.widenOutward.
    val aggs = Seq(count(lit(1)).as("n_rows"), agg.as("bloom")) ++
      statsCols.flatMap(c => Seq(
        ZoneMap.widenOutward(min(col(c)).cast("double"), -1).as(s"__mn_$c"),
        ZoneMap.widenOutward(max(col(c)).cast("double"), +1).as(s"__mx_$c")))
    val perFile = TxLog.read(spark, dir)
      .select((input_file_name().as("file") +: col(bloomCol) +:
        statsCols.map(col)): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint() // one scan feeds both outputs
    val bloomIdx = perFile
      .select(col("file"), col("n_rows"), col("bloom"))
      .withColumn("capacity", lit(expectedPerFile))
      .withColumn("num_bits", lit(numBits))
    val manifest = perFile.select(col("file"),
      explode(array(statsCols.map(c => struct(
        lit(c).as("column"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))): _*)).as("s"),
      col("n_rows").as("file_rows"))
      .select(col("file"), col("s.column").as("column"),
        col("s.min_value").as("min_value"), col("s.max_value").as("max_value"),
        col("file_rows"))
      .filter(col("min_value").isNotNull) // all-null columns: no stats row
    (bloomIdx, manifest)
  }

  /** Incremental maintenance, same contract as [[ZoneMap.refresh]]:
    * scan only files that appeared since the index was built, drop
    * rows for vanished files. Returns (index', filesScanned).
    */
  def refresh(
      spark: SparkSession,
      dir: String,
      index: DataFrame,
      column: String,
      expectedPerFile: Long = 1L << 20,
      fpp: Double = 0.01): (DataFrame, Long) = {
    val reader = TxLog.read(spark, dir)
    val live = TxLog.dataInputFilesOf(reader).toSet
    val known = index.select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val fresh = (live -- known).toSeq.sorted
    val kept = index.filter(col("file").isin(live.toSeq: _*))
    if (fresh.isEmpty) return (kept, 0L)
    val added = buildForFiles(spark, fresh, reader.schema, column,
      expectedPerFile, fpp)
    (kept.unionByName(added), fresh.length.toLong)
  }

  /** Executor-side probe: (file, hit) per indexed file — the ONLY
    * thing collected; bloom bytes never reach the driver.
    */
  private def candidateStatus(
      index: DataFrame,
      hashes: Column): Array[(String, Boolean)] =
    index.select(col("file"),
      BloomProbeFunctions.bloomMightContainAny(col("bloom"), hashes).as("hit"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))

  /** Files that might hold any of `values` in `column`: bloom-positive
    * indexed files plus every unindexed file (unknown never prunes).
    */
  def candidateFiles(
      index: DataFrame,
      allFiles: Seq[String],
      values: Seq[Any]): Seq[String] = {
    val hashes = array(values.map(v => xxhash64(lit(v))): _*)
    val status = candidateStatus(index, hashes).toMap
    allFiles.filter(f => status.getOrElse(f, true))
  }

  /** Read only candidate files, then apply the equality predicate
    * exactly. Result is identical to the unpruned `isin` read.
    */
  def prunedRead(
      spark: SparkSession,
      dir: String,
      index: DataFrame,
      column: String,
      values: Seq[Any]): DataFrame = {
    val all = TxLog.read(spark, dir)
    val cand = candidateFiles(index, TxLog.dataInputFilesOf(all), values)
    val src =
      if (cand.isEmpty) all.limit(0)
      else TxLog.readPrunedUris(spark, dir, cand, all.schema)
    src.filter(col(column).isin(values: _*))
  }
}
