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
  * replays a micro-batch after a failure, and `appendKeyed`'s id
  * anti-join makes the replay a no-op — the standard idempotent-sink
  * contract, the same one the ETL's fact append relies on.
  *
  * Quantizer state loads ONCE at sink construction (it is immutable by
  * design — a retrain is a new index name), so per-batch work is one
  * assignment/encode scan of the batch plus the keyed merge; nothing
  * touches rows already encoded.
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
      store.appendKeyed(
        Ivf.assign(cens, batch.toDF(), idCol, vecCol), s"${name}__assigned", "id")
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
      store.appendKeyed(
        IvfPq.encode(cens, cb, batch.toDF(), idCol, vecCol), s"${name}__encoded", "id")
  }
}
