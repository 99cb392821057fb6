package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import graft.similarity.{IndexStore, Ivf, IvfPq}
import graft.sources.TableStore

/** Streaming ingest into a stored ANN index — the `foreachBatch` twin
  * of [[IndexStore.appendIvfBatch]]/[[IndexStore.appendIvfPqBatch]]:
  * each embedding micro-batch is encoded with the STORED quantizers
  * (no retrain, batch cells agree with the corpus Voronoi boundaries)
  * and merged into the corpus-sized table by id.
  *
  * Exactly-once without a transactional sink: Structured Streaming
  * replays a micro-batch after a failure, and the append's id
  * anti-join (against a column-pruned id scan) makes the replay a
  * no-op — the standard idempotent-sink contract, the same one the
  * ETL's fact append relies on.
  *
  * Quantizer state loads ONCE at sink construction (it is immutable by
  * design — a retrain is a new index name), so per-batch work is one
  * assignment/encode scan of the batch, the id anti-join (pruned to
  * the batch's own cell partitions; with an id-bloom sidecar —
  * [[IndexStore.buildIdBloom]] — mostly-novel batches skip corpus id
  * reads entirely), and a partition-staged append into only the cell
  * partitions the batch touches; bytes already encoded are never
  * rewritten (a keyed whole-table merge would rewrite the corpus per
  * micro-batch).
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
      vecCol: String = "embedding"): (Dataset[Row], Long) => Unit = {
    val cens = IndexStore.loadIvfCentroids(store, name)
    (batch: Dataset[Row], _: Long) =>
      IndexStore.appendNewById(store, s"${name}__assigned",
        Ivf.assign(cens, batch.toDF(), idCol, vecCol))
  }

  /** foreachBatch function encoding each micro-batch into a stored
    * IVF-PQ index's `__encoded` table (16 B/vector codes).
    */
  def ivfPqSink(
      store: TableStore,
      name: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): (Dataset[Row], Long) => Unit = {
    val cens = IndexStore.loadIvfCentroids(store, name)
    val cb = IndexStore.loadPqCodebook(store, name)
    (batch: Dataset[Row], _: Long) =>
      IndexStore.appendNewById(store, s"${name}__encoded",
        IvfPq.encode(cens, cb, batch.toDF(), idCol, vecCol))
  }
}
