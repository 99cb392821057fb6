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

  /** Build the manifest for `cols` (numeric columns only: int/long/
    * float/double) over the parquet files under `dir`. One row per
    * (file, column): global min/max across the file's row groups plus
    * the file's row count. Footer reads fan out across executors —
    * the data pages are never touched.
    */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val files = spark.read.parquet(dir).inputFiles
    val want = cols.toSet
    val rows = spark.sparkContext
      .parallelize(files.toSeq, math.max(1, math.min(files.length, 64)))
      .flatMap { f =>
        val in = HadoopInputFile.fromPath(new Path(f), new Configuration())
        val r = ParquetFileReader.open(in)
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
                      (st.genericGetMin.toString.toDouble,
                        st.genericGetMax.toString.toDouble)
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
    spark.createDataFrame(rows)
      .toDF("file", "column", "min_value", "max_value", "file_rows")
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
    val all = spark.read.parquet(dir)
    val cand = candidateFiles(manifest, all.inputFiles.toSeq, column, lo, hi)
    val src =
      if (cand.isEmpty) all.limit(0)
      else spark.read.schema(all.schema).parquet(cand: _*)
    src.filter(col(column) >= lo && col(column) <= hi)
  }
}
