package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.MvStore
import graft.sources.ParquetStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class MvIngestSpec extends SparkSpec {

  private def newStore() =
    new ParquetStore(spark, Files.createTempDirectory("graft_mvingest").toString)

  private def canon(store: ParquetStore, name: String) =
    MvStore.read(store, name).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        math.round(r.getDouble(2) * 100) / 100.0))).toMap

  test("streamed epochs keep the MV equal to the live aggregate; sink-level replay is a no-op") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val store = newStore()
    val sink = MvIngest.mvSink(store, "d", "mv", Seq("k"), Seq("seg", "bal"),
      Seq("seg"), Seq("bal"), nShards = 4)
    val src = MemoryStream[DimRow]
    val q = src.toDF().writeStream.foreachBatch(sink).start()
    // epoch 0 seeds; epoch 1: a balance change, a segment move, an insert
    src.addData(Seq(DimRow(1, "A", 10.0), DimRow(2, "B", 20.0), DimRow(3, "A", 30.0)))
    q.processAllAvailable()
    assert(canon(store, "mv") == Map("A" -> ((2L, 40.0)), "B" -> ((1L, 20.0))))
    src.addData(Seq(DimRow(1, "A", 15.0), DimRow(2, "A", 20.0),
      DimRow(3, "A", 30.0), DimRow(4, "C", 5.0)))
    q.processAllAvailable()
    q.stop()
    assert(canon(store, "mv") ==
      Map("A" -> ((3L, 65.0)), "C" -> ((1L, 5.0))))
    // "B" emptied by the segment move: removed, not zero-rowed
    assert(MvStore.read(store, "mv").count() == 2)

    // failure-recovery shape (retry-before-advance, the only replay
    // foreachBatch can produce): epoch 1 re-delivered through the
    // sink — the SCD2 merge classifies unchanged AND the MV's epoch
    // stamp recognizes the refresh; neither layer moves
    MvIngest.mvSink(store, "d", "mv", Seq("k"), Seq("seg", "bal"),
      Seq("seg"), Seq("bal"), nShards = 4)(
      Seq(DimRow(1, "A", 15.0), DimRow(2, "A", 20.0),
        DimRow(3, "A", 30.0), DimRow(4, "C", 5.0)).toDF(), 1L)
    assert(canon(store, "mv") ==
      Map("A" -> ((3L, 65.0)), "C" -> ((1L, 5.0))))
  }

  test("followSink: streamed appends land as log commits and the follower MV tracks continuously") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val store = newStore()
    val dir = Files.createTempDirectory("mv_follow_sink").toString + "/t"
    val sink = MvIngest.followSink(store, "fmv", dir, Seq("seg"), Seq("bal"))
    val src = MemoryStream[DimRow]
    val q = src.toDF().writeStream.foreachBatch(sink).start()
    src.addData(Seq(DimRow(1, "A", 10.0), DimRow(2, "B", 20.0)))
    q.processAllAvailable()
    src.addData(Seq(DimRow(3, "A", 5.0), DimRow(4, "C", 7.0)))
    q.processAllAvailable()
    q.stop()
    // the view equals the snapshot's live aggregate after both epochs
    assert(canon(store, "fmv") ==
      Map("A" -> ((2L, 15.0)), "B" -> ((1L, 20.0)), "C" -> ((1L, 7.0))))
    // retry-before-advance replay: the epoch's commit is recognized by
    // its txn id and the follower's advance is a cursor no-op
    MvIngest.followSink(store, "fmv", dir, Seq("seg"), Seq("bal"))(
      Seq(DimRow(3, "A", 5.0), DimRow(4, "C", 7.0)).toDF(), 1L)
    assert(canon(store, "fmv") ==
      Map("A" -> ((2L, 15.0)), "B" -> ((1L, 20.0)), "C" -> ((1L, 7.0))))
    assert(graft.ops.TxLog.currentVersion(spark, dir) == 2) // v0 + 2 epochs… not 3
  }

  test("seed epoch re-delivered before advancing: the init stamp catches it") {
    import spark.implicits._
    val store = newStore()
    val sink = MvIngest.mvSink(store, "d", "mv", Seq("k"), Seq("seg", "bal"),
      Seq("seg"), Seq("bal"), nShards = 4)
    val b0 = Seq(DimRow(1, "A", 10.0), DimRow(2, "B", 20.0)).toDF()
    sink(b0, 0L)
    assert(canon(store, "mv") == Map("A" -> ((1L, 10.0)), "B" -> ((1L, 20.0))))
    // a naive sink would re-apply every version-0 insert as a delta
    sink(b0, 0L)
    assert(canon(store, "mv") == Map("A" -> ((1L, 10.0)), "B" -> ((1L, 20.0))))
  }
}
