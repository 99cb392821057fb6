package graft.streaming

import org.apache.spark.sql.{Dataset, Row}

import graft.ops.{MvStore, Scd2}
import graft.sources.TableStore

/** Streaming maintenance of a persisted incremental MV ([[MvStore]])
  * stacked on a streaming SCD2 history ([[Scd2Ingest]]) — the full
  * CDC pipeline as one `foreachBatch` sink: each micro-batch of
  * dimension upserts (1) merges into the versioned history at the
  * epoch version, (2) derives that epoch's change feed from the
  * history ([[Scd2.changes]] over exactly (epoch-1, epoch]), and
  * (3) applies the signed delta to the stored view, stamped with the
  * epoch as the batch id.
  *
  * Replay contract, layered: a re-delivered epoch re-merges
  * unchanged (SCD2's classification), re-derives the SAME change
  * feed, and the MV's epoch-stamped refresh recognizes it — each
  * layer is idempotent on its own, so a crash anywhere between the
  * three steps heals on redelivery. The first epoch seeds the view
  * from the freshly merged current table (the only source scan).
  */
object MvIngest {

  /** foreachBatch function: land each micro-batch as ONE [[graft.ops
    * .TxLog]] commit ([[TxLogIngest.appendSink]], epoch txn id), then
    * advance the follower view from its persisted cursor
    * ([[MvStore.followTxLog]]) — streaming ingest and its derived
    * aggregate ride a single sink, continuously. Replay heals at
    * every layer: a re-delivered epoch's commit is txn-recognized, the
    * follower's advance is version-range-stamped, and the cursor
    * re-pin is idempotent. With `compactEvery`, tail maintenance rides
    * along too, and the follower sees compaction as a no-op diff
    * (moved rows cancel in the multiset difference).
    */
  def followSink(
      store: TableStore,
      mvName: String,
      dir: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      compactEvery: Int = 0): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], epoch: Long) => {
      TxLogIngest.appendSink(dir, compactEvery)(batch, epoch)
      MvStore.followTxLog(store, mvName, dir, groupCols, sumCols)
      ()
    }

  /** foreachBatch function: SCD2 merge + CDC-derived MV refresh. */
  def mvSink(
      store: TableStore,
      dimName: String,
      mvName: String,
      keyCols: Seq[String],
      attrCols: Seq[String],
      groupCols: Seq[String],
      sumCols: Seq[String],
      nShards: Int = 64): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], epoch: Long) => {
      Scd2.merge(store, dimName, batch.toDF(), keyCols, attrCols,
        version = epoch, nShards = nShards)
      if (!MvStore.exists(store, mvName))
        MvStore.init(store, mvName, Scd2.current(store, dimName),
          groupCols, sumCols, batchId = s"epoch$epoch")
      else
        MvStore.refresh(store, mvName,
          Scd2.changes(store, dimName, keyCols, epoch - 1, epoch),
          groupCols, sumCols, batchId = Some(s"epoch$epoch"))
      ()
    }
}
