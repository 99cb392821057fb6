package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.similarity.{IndexStore, Ivf, IvfPq}
import graft.sources.ParquetStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class IndexIngestSpec extends SparkSpec {

  private case class Vec(vec_id: Long, embedding: Array[Float])

  private def emb = graft.Tables.embeddings(spark, sf("embeddings"))
  private def newStore() =
    new ParquetStore(spark, Files.createTempDirectory("graft_ingest").toString)

  private def vecsOf(df: org.apache.spark.sql.DataFrame): Seq[Vec] =
    df.select("vec_id", "embedding").collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  test("streamed IVF ingest equals a one-shot build; micro-batch replay is a no-op") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // index trains on the initial corpus; the stream delivers the rest
    val corpus = emb.filter(col("vec_id") < 300)
    val late = vecsOf(emb.filter(col("vec_id") >= 300))
    val store = newStore()
    IndexStore.saveIvf(store, "ivf", Ivf.build(corpus, nLists = 8))

    val src = MemoryStream[Vec]
    val q = src.toDF().writeStream
      .foreachBatch(IndexIngest.ivfSink(store, "ivf"))
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

    val streamed = IndexStore.loadIvf(store, "ivf")
    // every vector once, none duplicated by the replay
    assert(streamed.assigned.count() == emb.count())
    assert(streamed.assigned.select("id").distinct().count() == emb.count())
    // assignments identical to the batch append path on the same quantizer
    val batchStore = newStore()
    IndexStore.saveIvf(batchStore, "ivf", Ivf.build(corpus, nLists = 8))
    IndexStore.appendIvfBatch(batchStore, "ivf", emb.filter(col("vec_id") >= 300))
    val expected = batchStore.read("ivf__assigned")
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = streamed.assigned
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expected)
  }

  test("streamed ingest with an id-bloom sidecar: replay still a no-op, sidecar tracks the stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val corpus = emb.filter(col("vec_id") < 300)
    val store = newStore()
    IndexStore.saveIvf(store, "ivfb", Ivf.build(corpus, nLists = 8))
    IndexStore.buildIdBloom(store, "ivfb__assigned",
      expectedIdsPerCell = 4096, fpp = 0.01)

    val src = MemoryStream[Vec]
    val q = src.toDF().writeStream
      .foreachBatch(IndexIngest.ivfSink(store, "ivfb"))
      .start()
    val late = vecsOf(emb.filter(col("vec_id") >= 300))
    val (b1, b2) = late.splitAt(late.length / 2)
    src.addData(b1)
    q.processAllAvailable()
    src.addData(b2)
    q.processAllAvailable()
    src.addData(b1) // replay: bloom marks all suspects -> exact no-op
    q.processAllAvailable()
    q.stop()

    val streamed = IndexStore.loadIvf(store, "ivfb")
    assert(streamed.assigned.count() == emb.count())
    assert(streamed.assigned.select("id").distinct().count() == emb.count())
    // sidecar counted each id exactly once (replays excluded by the
    // anti-join BEFORE the sidecar update sees them)
    val n = store.read("ivfb__assigned__idbloom")
      .agg(sum(col("n_ids"))).head().getLong(0)
    assert(n == emb.count(), s"sidecar counts $n")
  }

  test("streamed IVF-PQ ingest encodes with stored quantizers; queries see the union") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val corpus = emb.filter(col("vec_id") < 400)
    val store = newStore()
    IndexStore.saveIvfPq(store, "ipq", IvfPq.build(corpus, nLists = 8, m = 16, k = 16))

    val src = MemoryStream[Vec]
    val q = src.toDF().writeStream
      .foreachBatch(IndexIngest.ivfPqSink(store, "ipq"))
      .start()
    src.addData(vecsOf(emb.filter(col("vec_id") >= 400)))
    q.processAllAvailable()
    q.stop()

    val loaded = IndexStore.loadIvfPq(store, "ipq")
    assert(loaded.encoded.count() == emb.count())
    // a late-arriving vector is findable at full probe
    val queries = emb.filter(col("vec_id") === 450)
    val res = IvfPq.topK(loaded, emb, queries, kNeighbors = 5, nProbe = 8)
    assert(res.count() == 5)
  }
}
