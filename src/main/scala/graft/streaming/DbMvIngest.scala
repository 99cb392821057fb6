package graft.streaming

import org.apache.spark.sql.{Dataset, Row}

import graft.ops.{DbLog, DbMv, TxLog}

/** Streaming maintenance of an N-table star view ([[DbMv]]) inside a
  * [[DbLog]] database — the `foreachBatch` member of the sink family
  * for the database-resident MV form: each micro-batch lands into ONE
  * table of the database as an epoch-stamped transaction, then the
  * star view advances to the database's new head
  * ([[DbMv.refreshStar]]) — streaming ingest and its derived N-table
  * incremental aggregate ride a single sink, continuously.
  *
  * Replay contract, layered (the [[MvIngest.followSink]] discipline
  * over a database): a re-delivered epoch's transaction is recognized
  * by its txn id ([[TxLog.txnCommitted]]) and never re-lands; the
  * view's advance is cursor-guarded with state + cursor in ONE atomic
  * commit, so the crash window where the epoch's append landed but
  * the refresh never ran completes exactly once on redelivery — and a
  * redelivery racing an interleaved EXTERNAL commit advances over the
  * union window without applying the epoch's rows twice (the cursor
  * saw them move). Sibling-table commits between epochs are cursor
  * hops; the view state is untouched.
  */
object DbMvIngest {

  /** foreachBatch function: land each micro-batch into `table` of the
    * database (append-only when `keyCols` is empty, keyed
    * merge-on-read upsert otherwise), then advance the star view
    * `viewName`. The view seeds on first use from `view` (one
    * definition + state + cursor transaction — [[DbMv.initStar]]); a
    * seed epoch redelivered is caught by the init's existence probe
    * plus the epoch txn id.
    */
  def starFollowSink(
      db: String,
      table: String,
      viewName: String,
      view: DbMv.StarView,
      keyCols: Seq[String] = Nil): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], epoch: Long) => {
      val spark = batch.sparkSession
      if (!TxLog.exists(spark, db)) DbLog.create(spark, db)
      val txnId = s"dbmv_epoch_${table}_$epoch"
      if (!TxLog.txnCommitted(spark, db, txnId)) {
        // churn-sized by construction: one materialization instead of
        // re-running the source scan for the key probe, the DV semi
        // join and the staged append inside the keyed application
        val b = batch.toDF().localCheckpoint()
        val txn = DbLog.begin(spark, db)
        if (keyCols.isEmpty || !txn.tableExists(table))
          txn.append(table, b)
        else txn.upsertKeyed(table, keyCols, b)
        txn.commit(s"stream-epoch-$epoch", txn = Some(txnId))
      }
      if (!DbMv.isStar(spark, db, viewName))
        DbMv.initStar(spark, db, viewName, view)
      else DbMv.refreshStar(spark, db, viewName)
      ()
    }
}
