package graft.streaming

import org.apache.spark.sql.{Dataset, Row}

import graft.ops.RollupStore
import graft.sources.TableStore

/** Streaming maintenance of a stored rollup ([[RollupStore]]) — the
  * `foreachBatch` member of the sink family ([[IndexIngest]] for ANN
  * indexes, [[DedupIngest]] for dedup state): each micro-batch folds
  * its partial aggregates into the keyed state table, so a
  * continuously-arriving fact stream keeps `GROUP BY` results fresh
  * without ever rescanning history.
  *
  * Exactly-once under replay: Structured Streaming re-delivers a
  * failed epoch with the SAME batchId, and aggregation is not
  * idempotent — so the sink keys every fold by the epoch
  * (`batchId = Some("epoch_<n>")` → [[RollupStore.ingest]]'s stamped
  * replay probe), which is strictly stronger than the content key the
  * batch path defaults to: two epochs that legitimately carry
  * identical rows still fold twice, while a re-delivered epoch is
  * recognized and skipped no matter what it contains.
  *
  * The first epoch initializes the rollup (shard count + sketch-k
  * become frozen state); every later epoch reads and rewrites only the
  * shards its keys hash into.
  */
object RollupIngest {

  /** foreachBatch function folding each micro-batch into the rollup
    * `name`, creating it on the first epoch. All four mergeable state
    * families pass through: count/sum/min/max, KMV ndv, Misra-Gries
    * top-k, log-binned quantiles.
    */
  def rollupSink(
      store: TableStore,
      name: String,
      keys: Seq[String],
      measures: Seq[String],
      nShards: Int = 64,
      distinctMeasures: Seq[String] = Nil,
      kmvK: Int = 256,
      topkMeasures: Seq[String] = Nil,
      topkK: Int = 256,
      quantileMeasures: Seq[String] = Nil,
      quantBins: Int = 512): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], epoch: Long) => {
      val bid = Some(s"epoch_$epoch")
      if (!RollupStore.exists(store, name))
        RollupStore.init(store, name, batch.toDF(), keys, measures,
          nShards, bid, distinctMeasures, kmvK, topkMeasures, topkK,
          quantileMeasures, quantBins)
      else
        RollupStore.ingest(store, name, batch.toDF(), keys, measures,
          bid, distinctMeasures, topkMeasures, quantileMeasures)
      ()
    }
}
