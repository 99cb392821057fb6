package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stats-pruned MERGE: apply a keyed update batch to a parquet
  * directory by rewriting ONLY the files whose bloom index admits one
  * of the batch's keys — the third leg of the file-surgery DML triad
  * ([[Compact]] reorganizes, [[DeleteWhere]] removes, this replaces/
  * inserts). [[graft.sources.ParquetUpsert.mergeByKey]] is the
  * whole-table primitive; at 100 TB a daily update batch touches a
  * vanishing fraction of files, and rewriting the rest is the cost a
  * transactional-log format avoids — this brings the same O(touched
  * files) bound to a plain directory.
  *
  * Semantics are MERGE by key, identical to ParquetUpsert: rows of
  * `updates` replace existing rows with the same key; keys present in
  * no file at all append as inserts. Soundness of the pruning leans on
  * the bloom's no-false-negative guarantee: a non-candidate file
  * CANNOT contain an update key, so leaving it untouched is safe; a
  * false positive merely rewrites a file that didn't need it.
  *
  * The rewrite goes through [[Compact.stageRewrite]] + [[Compact
  * .recover]] — staged write, rename-published commit marker,
  * idempotent completion — one crash discipline across the triad.
  */
object UpsertWhere {

  final case class Receipt(
      filesTotal: Long,
      candidates: Long,
      untouched: Long,
      updatedRows: Long,
      insertedRows: Long)

  /** Merge `updates` (same schema as the table) by `keyCol`. `index`
    * is a persisted [[BloomFileIndex]] for `keyCol`; omitted, every
    * file is a candidate (plain whole-table merge). The update batch
    * is driver-sized (its keys are collected to probe the index) —
    * the request-batch shape, same bound as [[DeleteWhere.byKeys]].
    */
  def byKeys(
      spark: SparkSession,
      dir: String,
      keyCol: String,
      updates: DataFrame,
      index: Option[DataFrame] = None): Receipt = {
    Compact.recover(spark, dir)
    val all = DeleteWhere.allFiles(spark, dir)
    val cols = spark.read.parquet(all.head).columns
    val up = updates.select(cols.map(col): _*)
    val keys: Seq[Any] = up.select(keyCol).distinct().collect().map(_.get(0)).toSeq
    if (keys.isEmpty) return Receipt(all.length, 0, all.length, 0, 0)
    val cand = index match {
      case Some(ix) => BloomFileIndex.candidateFiles(ix, all, keys)
      case None => all
    }
    // every count is taken BEFORE the rewrite commits — the candidate
    // lineage reads files the commit deletes
    val (staged, updatedRows, insertedRows) =
      if (cand.isEmpty) (up, 0L, up.count())
      else {
        val candDf = spark.read.parquet(cand: _*)
        val replaced = candDf
          .join(up.select(keyCol).distinct(), Seq(keyCol), "left_semi").count()
        val inserted = RelationalOps.antiJoinNew(up, candDf, Seq(keyCol)).count()
        (RelationalOps.antiJoinNew(candDf, up, Seq(keyCol)).unionByName(up),
          replaced, inserted)
      }
    Compact.stageRewrite(spark, dir,
      cand.map(f => new org.apache.hadoop.fs.Path(f).getName),
      stagePath => staged.write.mode("overwrite").parquet(stagePath))
    Compact.recover(spark, dir)
    Receipt(
      filesTotal = all.length,
      candidates = cand.length,
      untouched = all.length - cand.length,
      updatedRows = updatedRows,
      insertedRows = insertedRows)
  }
}
