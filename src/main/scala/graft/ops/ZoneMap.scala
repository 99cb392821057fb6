package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone maps: a per-file min/max manifest over numeric columns, built
  * from parquet FOOTERS only — no data pages are read — and the
  * pruned-read operator that consults it. The read-side companion of
  * [[ZOrder]]: clustering narrows per-file spans at write time, the
  * manifest turns those narrow spans into a driver-side file-skip
  * index at read time, the same role Delta's file statistics or an
  * Iceberg manifest play.
  *
  * 100 TB shape: the manifest is metadata-sized (one row per file ×
  * column — a 100k-file table yields ~10⁵ rows per column, kilobytes
  * per partition of actual data), built once per layout job by
  * distributing footer reads across executors, then consulted
  * driver-side per query. A selective scan goes manifest → candidate
  * file list → `spark.read.parquet(candidates)`, so planning cost is
  * O(files-that-match) instead of listing + footer-reading the whole
  * table on every query. Pruning is safe by construction: a file is
  * dropped only when its [min,max] cannot intersect the predicate
  * range, and the residual filter still runs over the survivors (the
  * manifest is necessary, never trusted as sufficient).
  */
object ZoneMap {

  /** Footer stat → double bound, widened OUTWARD when the exact value
    * is not double-representable. INT64 stats above 2⁵³ (snowflake-
    * style ids ~10¹⁸) round to the nearest double, which for a max can
    * round DOWN — an underestimating bound lets `candidateFiles` prune
    * a file that contains matching rows, and a ranged DELETE built on
    * it silently misses rows. So a long min that rounded up steps down
    * one ulp and a long max that rounded down steps up one ulp: the
    * stored span always CONTAINS the true span, and widening can only
    * admit (never drop) a candidate. INT32 and FLOAT widen to double
    * exactly by construction (no `toString` round-trip — `Float
    * .toString` emits the shortest float-round-trip string, which can
    * parse to a double on the WRONG side of the exact widening).
    */
  private[ops] def boundToDouble(v: Any, isMin: Boolean): Double = v match {
    case l: java.lang.Long =>
      val d = l.longValue.toDouble
      val cmp = BigDecimal(d).compare(BigDecimal(l.longValue))
      if (isMin && cmp > 0) Math.nextDown(d)
      else if (!isMin && cmp < 0) Math.nextUp(d)
      else d
    case i: java.lang.Integer => i.doubleValue()
    case f: java.lang.Float => f.doubleValue()
    case d: java.lang.Double => d.doubleValue()
    case other => other.toString.toDouble
  }

  /** [[boundToDouble]] restated as a SQL expression, for bounds that
    * are computed executor-side (no nextUp/nextDown function exists in
    * SQL): widen by |v|·2⁻⁵¹ — between one and four ulps, always
    * outward (`direction` −1 for a lower bound, +1 for an upper), and
    * only where double-exactness is in doubt (|v| > 2⁵³). Harmless on
    * float/double inputs: widening only ever ADMITS candidates.
    */
  private[ops] def widenOutward(
      d: org.apache.spark.sql.Column,
      direction: Int): org.apache.spark.sql.Column =
    when(abs(d) <= lit(9.007199254740992e15), d)
      .otherwise(d + lit(direction) * abs(d) * lit(4.440892098500626e-16))

  /** Build the manifest for `cols` (numeric columns only: int/long/
    * float/double) over the parquet files under `dir`. One row per
    * (file, column): global min/max across the file's row groups plus
    * the file's row count. Footer reads fan out across executors —
    * the data pages are never touched.
    */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame =
    buildForFiles(spark, TxLog.dataInputFiles(spark, dir), cols)

  /** Footer stats for an explicit file list, as a driver map path →
    * (column, min, max) rows — the form [[TxLog.commit]] embeds in its
    * ADD entries. `lenient` skips unreadable/absent paths (a commit
    * may name files that are not data, or not yet present) instead of
    * failing the build.
    */
  private[ops] def statsForFiles(
      spark: SparkSession,
      paths: Seq[String],
      cols: Seq[String],
      lenient: Boolean = false): Map[String, Seq[(String, Double, Double)]] =
    buildForFiles(spark, paths, cols, lenient).collect()
      .groupBy(_.getString(0))
      .map { case (f, rows) =>
        f -> rows.toSeq.map(r =>
          (r.getString(1), r.getDouble(2), r.getDouble(3)))
      }

  private def buildForFiles(
      spark: SparkSession,
      files: Seq[String],
      cols: Seq[String],
      lenient: Boolean = false): DataFrame = {
    val want = cols.toSet
    val confEnts = Compact.confEntries(spark)
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.length, 64)))
      .flatMap { f =>
        val opened =
          try Some(ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(f),
              Compact.confFrom(confEnts))))
          catch { case _: Exception if lenient => None }
        opened.toSeq.flatMap { r =>
          try {
          val blocks = r.getFooter.getBlocks
          val nRows = {
            var n = 0L; blocks.forEach(b => n += b.getRowCount); n
          }
          val acc = scala.collection.mutable.Map.empty[String, (Double, Double)]
          blocks.forEach { b =>
            b.getColumns.forEach { c =>
              val name = c.getPath.toDotString
              if (want.contains(name)) {
                val st: org.apache.parquet.column.statistics.Statistics[_] =
                  c.getStatistics
                if (st != null && !st.isEmpty && st.hasNonNullValue) {
                  val (mn, mx) = c.getPrimitiveType.getPrimitiveTypeName match {
                    case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 |
                        PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
                      (boundToDouble(st.genericGetMin, isMin = true),
                        boundToDouble(st.genericGetMax, isMin = false))
                    case _ => (Double.NaN, Double.NaN)
                  }
                  if (!mn.isNaN) {
                    val cur = acc.getOrElse(name, (mn, mx))
                    acc(name) = (math.min(cur._1, mn), math.max(cur._2, mx))
                  }
                }
              }
            }
          }
          acc.iterator.map { case (c, (mn, mx)) => (f, c, mn, mx, nRows) }.toSeq
          } finally r.close()
        }
      }
    spark.createDataFrame(rows)
      .toDF("file", "column", "min_value", "max_value", "file_rows")
  }

  /** ROW-GROUP-granular manifest: one row per (file, row_group,
    * column) with min/max and the group's row count — the per-block
    * stats the footer already holds, surfaced instead of rolled up.
    * Spark's scan prunes row groups itself once the filter is pushed,
    * so the increment over the per-file manifest is PLANNING: which
    * (file, row group) pairs a range can touch, and how many rows —
    * [[estimateRows]] — BEFORE any scan launches. On a clustered
    * layout ([[ZOrder]]) that estimate is tight enough to drive
    * admission control or cost-based routing of ad-hoc queries.
    */
  def buildRowGroups(
      spark: SparkSession,
      dir: String,
      cols: Seq[String]): DataFrame = {
    val want = cols.toSet
    val files = TxLog.dataInputFiles(spark, dir)
    val confEnts = Compact.confEntries(spark)
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.length, 64)))
      .flatMap { f =>
        val in = HadoopInputFile.fromPath(new Path(f),
          Compact.confFrom(confEnts))
        val r = ParquetFileReader.open(in)
        try {
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, Int, String, Double, Double, Long)]
          var rg = 0
          r.getFooter.getBlocks.forEach { b =>
            b.getColumns.forEach { c =>
              val name = c.getPath.toDotString
              if (want.contains(name)) {
                val st = c.getStatistics
                if (st != null && !st.isEmpty && st.hasNonNullValue) {
                  c.getPrimitiveType.getPrimitiveTypeName match {
                    case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 |
                        PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
                      out += ((f, rg, name,
                        boundToDouble(st.genericGetMin, isMin = true),
                        boundToDouble(st.genericGetMax, isMin = false),
                        b.getRowCount))
                    case _ => ()
                  }
                }
              }
            }
            rg += 1
          }
          out.toSeq
        } finally r.close()
      }
    spark.createDataFrame(rows)
      .toDF("file", "row_group", "column", "min_value", "max_value", "rg_rows")
  }

  /** The (file, row_group) pairs whose span on `column` intersects
    * [lo, hi]. Driver-side over the metadata-sized manifest.
    */
  def candidateRowGroups(
      manifest: DataFrame,
      column: String,
      lo: Double,
      hi: Double): Seq[(String, Int)] =
    manifest.filter(col("column") === column &&
        col("max_value") >= lo && col("min_value") <= hi)
      .select("file", "row_group").collect()
      .map(r => (r.getString(0), r.getInt(1)))

  /** Upper bound on the rows a range scan can touch — the sum of the
    * candidate row groups' counts. Zero means the scan can be skipped
    * entirely; a small number can route the query to a direct read.
    */
  def estimateRows(
      manifest: DataFrame,
      column: String,
      lo: Double,
      hi: Double): Long = {
    val r = manifest.filter(col("column") === column &&
        col("max_value") >= lo && col("min_value") <= hi)
      .agg(sum("rg_rows")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** STRING-column manifest: per-file lexicographic min/max from the
    * footers — the zone map for categorical and lexicographically
    * ordered columns (language codes, date strings, categories) the
    * numeric manifest cannot serve. One row per (file, column):
    * (file, column, min_str, max_str, file_rows). Pruning soundness
    * under parquet's stats rules: a chunk whose binary stats were
    * omitted (oversized values) reads as NO stats row here, and an
    * unknown file never prunes.
    */
  def buildString(
      spark: SparkSession,
      dir: String,
      cols: Seq[String]): DataFrame =
    stringStatsRows(spark, TxLog.dataInputFiles(spark, dir), cols)

  /** [[buildString]]'s core over an EXPLICIT file list — the seam
    * version-scoped consumers ([[TxLog.snapshotPrunedString]]) use.
    * Session conf ships to the executors (credentials/fs bindings
    * survive); one footer metadata read per file, distributed.
    */
  private[ops] def stringStatsRows(
      spark: SparkSession,
      files: Seq[String],
      cols: Seq[String]): DataFrame = {
    val want = cols.toSet
    val confEnts = Compact.confEntries(spark)
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.length, 64)))
      .flatMap { f =>
        val in = HadoopInputFile.fromPath(new Path(f),
          Compact.confFrom(confEnts))
        val r = ParquetFileReader.open(in)
        try {
          val blocks = r.getFooter.getBlocks
          val nRows = {
            var n = 0L; blocks.forEach(b => n += b.getRowCount); n
          }
          // min/max merge in parquet's OWN order — unsigned UTF-8
          // bytes. Java String '<' is UTF-16 code-unit order, which
          // DISAGREES above the BMP (a supplementary char sorts below
          // U+E000 in UTF-16 but above it in UTF-8 bytes), so merging
          // or probing with String compares can under-report a span
          // and wrongly prune a file that holds the value.
          val acc =
            scala.collection.mutable.Map.empty[String, (Array[Byte], Array[Byte])]
          var complete = Set.empty[String] // columns with stats in EVERY block
          var first = true
          blocks.forEach { b =>
            val here = scala.collection.mutable.Set.empty[String]
            b.getColumns.forEach { c =>
              val name = c.getPath.toDotString
              if (want.contains(name) &&
                c.getPrimitiveType.getPrimitiveTypeName == PrimitiveTypeName.BINARY) {
                val st = c.getStatistics
                if (st != null && !st.isEmpty && st.hasNonNullValue) {
                  val mn = st.getMinBytes
                  val mx = st.getMaxBytes
                  val cur = acc.getOrElse(name, (mn, mx))
                  acc(name) = (
                    if (leUnsigned(mn, cur._1)) mn else cur._1,
                    if (leUnsigned(cur._2, mx)) mx else cur._2)
                  here += name
                }
              }
            }
            complete = if (first) here.toSet else complete.intersect(here.toSet)
            first = false
          }
          // a column missing stats in ANY block yields no manifest row
          // (partial stats could under-report the file's true span)
          acc.iterator.filter(kv => complete(kv._1))
            .map { case (c, (mn, mx)) =>
              (f, c, new String(mn, "UTF-8"), new String(mx, "UTF-8"), nRows)
            }.toSeq
        } finally r.close()
      }
    spark.createDataFrame(rows)
      .toDF("file", "column", "min_str", "max_str", "file_rows")
  }

  /** Unsigned lexicographic ≤ over raw bytes — parquet's binary-stats
    * order. The ONLY order the string manifest may be probed or merged
    * in: Java String comparison diverges above the BMP.
    */
  private[ops] def leUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length <= b.length
  }

  private[ops] def leUtf8(a: String, b: String): Boolean =
    leUnsigned(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  /** Files whose lexicographic [min,max] on `column` can contain
    * `value` — plus any file without a stats row (unknown never
    * prunes). Containment is decided in unsigned UTF-8 byte order,
    * matching how the stats were written and merged.
    */
  def candidateFilesString(
      manifest: DataFrame,
      allFiles: Seq[String],
      column: String,
      value: String): Seq[String] = {
    val known = manifest.filter(col("column") === column)
      .select("file", "min_str", "max_str").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    allFiles.filter(f => known.get(f) match {
      case Some((mn, mx)) => leUtf8(mn, value) && leUtf8(value, mx)
      case None => true
    })
  }

  /** Equality read over the string manifest: only files that can hold
    * `column` = `value`, residual filter over the survivors. Result
    * identical to the unpruned filtered read.
    */
  def prunedReadString(
      spark: SparkSession,
      dir: String,
      manifest: DataFrame,
      column: String,
      value: String): DataFrame = {
    val all = TxLog.read(spark, dir)
    val cand =
      candidateFilesString(manifest, TxLog.dataInputFilesOf(all), column, value)
    val src =
      if (cand.isEmpty) all.limit(0)
      else TxLog.readPrunedUris(spark, dir, cand, all.schema)
    src.filter(col(column) === value)
  }

  /** Incremental manifest maintenance: footer-read ONLY files that
    * appeared since `manifest` was built, drop rows for files that
    * vanished (compaction, vacuum), carry everything else over
    * untouched. An appending table refreshes in O(new files) — the
    * property that makes a statistics manifest viable at 100 TB,
    * where a full rebuild would re-open 10⁵+ footers per batch while
    * a streaming ingest adds a handful.
    *
    * Returns (manifest', footersRead) — the count is the cost receipt
    * the incremental contract is asserted on.
    */
  def refresh(
      spark: SparkSession,
      dir: String,
      manifest: DataFrame,
      cols: Seq[String]): (DataFrame, Long) = {
    val live = TxLog.dataInputFiles(spark, dir).toSet
    val known = manifest.select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val fresh = (live -- known).toSeq.sorted
    val kept = manifest.filter(col("file").isin(live.toSeq: _*))
    if (fresh.isEmpty) return (kept, 0L)
    val added = buildForFiles(spark, fresh, cols)
    (kept.unionByName(added), fresh.length.toLong)
  }

  /** Files whose [min,max] on `column` intersects [lo, hi] — plus any
    * file the manifest has no stats row for (unknown never prunes).
    * Driver-side over the metadata-sized manifest.
    */
  def candidateFiles(
      manifest: DataFrame,
      allFiles: Seq[String],
      column: String,
      lo: Double,
      hi: Double): Seq[String] = {
    val known = manifest.filter(col("column") === column)
      .select("file", "min_value", "max_value").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    allFiles.filter(f => known.get(f) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true
    })
  }

  /** Read only the files that can hold `column` ∈ [lo, hi], then apply
    * the predicate exactly (manifest pruning is file-granular; the
    * residual filter — pushed to the survivors' scans — finishes the
    * job). Result is identical to the unpruned filtered read.
    */
  def prunedRead(
      spark: SparkSession,
      dir: String,
      manifest: DataFrame,
      column: String,
      lo: Double,
      hi: Double): DataFrame = {
    val all = TxLog.read(spark, dir)
    val cand =
      candidateFiles(manifest, TxLog.dataInputFilesOf(all), column, lo, hi)
    val src =
      if (cand.isEmpty) all.limit(0)
      else TxLog.readPrunedUris(spark, dir, cand, all.schema)
    src.filter(col(column) >= lo && col(column) <= hi)
  }

  /** The files a ROW-GROUP-granular range probe admits: every file
    * with at least one candidate row group, PLUS every file the
    * manifest does not cover for `column` (unknown never prunes —
    * same rule as [[candidateFiles]]). Strictly at most the
    * file-level candidate set, and strictly smaller when a file's
    * row groups leave a GAP the range falls into (file span
    * [min-of-groups, max-of-groups] intersects, no single group
    * does) — the case file-level stats cannot see.
    */
  def candidateFilesRowGroups(
      rgManifest: DataFrame,
      allFiles: Seq[String],
      column: String,
      lo: Double,
      hi: Double): Seq[String] = {
    val covered = rgManifest.filter(col("column") === column)
      .select("file").distinct().collect().map(_.getString(0)).toSet
    val hit = candidateRowGroups(rgManifest, column, lo, hi)
      .map(_._1).toSet
    allFiles.filter(f => hit(f) || !covered(f))
  }

  /** Range read ROUTED through the row-group manifest: files with no
    * candidate row group are never opened (incl. the gap case the
    * file-level manifest admits), and inside each opened file the
    * pushed range predicate lets parquet's own row-group stats — the
    * SAME statistics the manifest was built from — skip the
    * non-candidate groups, so the groups decompressed are exactly
    * the manifest's candidates. An [[estimateRows]] of zero returns
    * the empty frame without touching a footer. Result identical to
    * the unpruned filtered read.
    */
  def routedRead(
      spark: SparkSession,
      dir: String,
      rgManifest: DataFrame,
      column: String,
      lo: Double,
      hi: Double): DataFrame = {
    val all = TxLog.read(spark, dir)
    val cand = candidateFilesRowGroups(
      rgManifest, TxLog.dataInputFilesOf(all), column, lo, hi)
    val src =
      if (cand.isEmpty) all.limit(0)
      else TxLog.readPrunedUris(spark, dir, cand, all.schema)
    src.filter(col(column) >= lo && col(column) <= hi)
  }
}
