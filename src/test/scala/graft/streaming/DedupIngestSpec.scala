package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.dedup.{Dedup, DedupState}
import graft.sources.ParquetStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class DedupIngestDoc(doc_id: Long, text: String)

class DedupIngestSpec extends SparkSpec {

  private def newStore() =
    new ParquetStore(spark, Files.createTempDirectory("graft_dedupingest").toString)

  test("streamed dedup ingest equals the batch incremental path; replay lands nothing twice") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val all = graft.Tables.documents(spark, sf("documents"))
      .select(col("doc_id"), col("text"))
    val corpus = Dedup.minhashDedup(all.filter(col("doc_id") < 40), threshold = 0.8)
    val late = all.filter(col("doc_id") >= 40 && col("doc_id") < 100)
      .collect().map(r => DedupIngestDoc(r.getLong(0), r.getString(1))).toSeq

    val store = newStore()
    DedupState.init(store, "stream", corpus)
    val src = MemoryStream[DedupIngestDoc]
    val q = src.toDF().writeStream
      .foreachBatch(DedupIngest.minhashSink(store, "stream"))
      .start()
    val (b1, b2) = late.splitAt(late.length / 2)
    src.addData(b1)
    q.processAllAvailable()
    src.addData(b2)
    q.processAllAvailable()
    // replay of an already-ingested batch (failure-recovery shape)
    src.addData(b1)
    q.processAllAvailable()
    q.stop()

    // the folded-in corpus equals sequential batch-path folds of the
    // same two batches (order matters: b2 dedups against b1's folds)
    val expectStore = newStore()
    DedupState.init(expectStore, "stream", corpus)
    def toDf(docs: Seq[DedupIngestDoc]) = docs.toDF()
    DedupState.ingestBatch(expectStore, "stream", toDf(b1))
    DedupState.ingestBatch(expectStore, "stream", toDf(b2))
    def ids(s: ParquetStore) = s.read(DedupState.docsTable("stream"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(store) == ids(expectStore))
    // nothing landed twice — state keys unique in both tables
    assert(graft.similarity.IndexStore
      .duplicateIdAudit(store, DedupState.docsTable("stream")).isEmpty)
    assert(graft.similarity.IndexStore
      .duplicateIdAudit(store, DedupState.bandsTable("stream")).isEmpty)
  }
}
