package graft.streaming

import org.apache.spark.sql.{Dataset, Row}
import graft.similarity.IndexStore
import graft.sources.TableStore

/** Streaming ingest into a stored ANN index — the `foreachBatch` twin
  * of [[IndexStore.appendIvfBatch]]/[[IndexStore.appendIvfPqBatch]],
  * and now a thin delegation to them: each embedding micro-batch goes
  * through the full batch-ingest protocol — in-flight split heal,
  * quantizer-independent id-registry novelty gate, cell-pruned
  * idempotent append, registry commit.
  *
  * Exactly-once without a transactional sink: Structured Streaming
  * replays a micro-batch after a failure, and the registry gate (by
  * hash(id) shard — stable under splits and retrains) plus the
  * cell-pruned exact check make the replay a no-op — the same
  * idempotent-sink contract the ETL's fact append and the dedup state
  * rely on. The earlier design cached the quantizer at sink
  * construction; that cache is gone on purpose: a cell split between
  * micro-batches refines the Voronoi diagram, and assigning against
  * stale centroids would file new vectors into pre-split cells
  * forever. The per-batch centroid read is one tiny table.
  *
  * {{{
  * val sink = IndexIngest.ivfSink(store, "prod_index")
  * embStream.writeStream.foreachBatch(sink).start()
  * }}}
  */
object IndexIngest {

  /** foreachBatch function appending each micro-batch to a stored IVF
    * index's `__assigned` table.
    */
  def ivfSink(
      store: TableStore,
      name: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], _: Long) => {
      IndexStore.appendIvfBatch(store, name, batch.toDF(), idCol, vecCol)
      ()
    }

  /** foreachBatch function encoding each micro-batch into a stored
    * IVF-PQ index's `__encoded` table (16 B/vector codes).
    */
  def ivfPqSink(
      store: TableStore,
      name: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], _: Long) => {
      IndexStore.appendIvfPqBatch(store, name, batch.toDF(), idCol, vecCol)
      ()
    }
}
