package graft.streaming

import org.apache.spark.sql.{Dataset, Row}
import graft.dedup.DedupState
import graft.sources.TableStore

/** Streaming near-dedup into a [[DedupState]] corpus — the
  * `foreachBatch` twin of [[graft.dedup.Dedup.minhashDedupIncremental]],
  * as [[IndexIngest]] is to the ANN batch appends: each document
  * micro-batch is exact- and near-deduped against the hash-sharded
  * state tables (fingerprint shards + touched band shards only — never
  * an O(corpus) scan) and the survivors fold in.
  *
  * Exactly-once without a transactional sink: Structured Streaming
  * replays a micro-batch after a failure, and every state append is
  * keyed for the idempotent ingest kernel (fingerprint for docs,
  * band|fingerprint for bands), so a replay re-derives the same rows
  * and lands nothing twice; a crash BETWEEN the two state appends
  * heals on replay via [[DedupState.ingestBatch]]'s landed-fingerprint
  * band re-derivation. See [[DedupState]] for the full contract.
  *
  * {{{
  * DedupState.init(store, "corpus", seedDocs)    // optional seed
  * docStream.writeStream
  *   .foreachBatch(DedupIngest.minhashSink(store, "corpus"))
  *   .start()
  * }}}
  */
object DedupIngest {

  /** foreachBatch function folding each micro-batch's exact+near
    * survivors into the named dedup state.
    */
  def minhashSink(
      store: TableStore,
      name: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      p: DedupState.Params = DedupState.Params()): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], _: Long) =>
      DedupState.ingestBatch(store, name, batch.toDF(), idCol, textCol, p)
}
