package graft.streaming

import org.apache.spark.sql.{Dataset, Row}

import graft.ops.Scd2
import graft.sources.TableStore

/** Streaming maintenance of a type-2 SCD history ([[Scd2]]) — the
  * `foreachBatch` member of the sink family ([[RollupIngest]],
  * [[IndexIngest]], [[DedupIngest]]): each micro-batch of dimension
  * upserts merges into the versioned history, with the epoch number as
  * the version stamp — monotone by Structured Streaming's contract,
  * so validity intervals are totally ordered without any wall clock.
  *
  * Exactly-once under replay for free: a re-delivered epoch re-merges
  * the SAME snapshot at the SAME version — [[Scd2.merge]] classifies
  * every row unchanged against the already-updated current table and
  * touches nothing, and the closed-row append is idempotent per
  * (key, valid_to) through the ingest kernel even when the crash
  * landed between the two writes.
  */
object Scd2Ingest {

  /** foreachBatch function merging each micro-batch of dimension rows
    * into the SCD2 history `name`, creating it on the first epoch.
    */
  def scd2Sink(
      store: TableStore,
      name: String,
      keyCols: Seq[String],
      attrCols: Seq[String],
      nShards: Int = 64): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], epoch: Long) => {
      Scd2.merge(store, name, batch.toDF(), keyCols, attrCols,
        version = epoch, nShards = nShards)
      ()
    }
}
