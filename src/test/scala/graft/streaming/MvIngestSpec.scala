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

  test("followSink: crash between the follower's refresh and the epoch commit replays exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val store = newStore()
    val dir = Files.createTempDirectory("mv_crash_sink").toString + "/t"
    val sink = MvIngest.followSink(store, "fmv", dir, Seq("seg"), Seq("bal"))
    def live() = graft.ops.TxLog.snapshot(spark, dir).groupBy("seg")
      .agg(count(lit(1)), round(sum("bal"), 2)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    sink(Seq(DimRow(1, "A", 10.0), DimRow(2, "B", 20.0)).toDF(), 0L)
    val b1 = Seq(DimRow(3, "A", 5.0), DimRow(4, "C", 7.0)).toDF()
    // CRASH WINDOW 1: the whole sink ran for epoch 1 (append landed,
    // follower refreshed, cursor pinned) but the CHECKPOINT never
    // committed the epoch. The restart redelivers epoch 1 — and in
    // between, an EXTERNAL writer commits to the table. The epoch's
    // append is recognized by its txn id (never re-lands); the
    // follower's advance covers exactly the external commit's window
    // — epoch 1's rows must not apply twice through the wider window.
    sink(b1, 1L)
    graft.ops.TxLog.append(spark, dir,
      Seq(DimRow(9, "B", 100.0)).toDF()) // the interleaved external commit
    sink(b1, 1L) // redelivery
    assert(canon(store, "fmv") == live(),
      "redelivery over an interleaved commit must net to the live aggregate")
    assert(canon(store, "fmv") ==
      Map("A" -> ((2L, 15.0)), "B" -> ((2L, 120.0)), "C" -> ((1L, 7.0))))
    // CRASH WINDOW 2: the epoch's APPEND landed but the crash hit
    // before the follower's refresh — redelivery completes the
    // follower exactly once
    val b2 = Seq(DimRow(5, "C", 3.0)).toDF()
    TxLogIngest.appendSink(dir)(b2, 2L) // first half only = the crash
    sink(b2, 2L) // redelivery runs the whole sink
    assert(canon(store, "fmv") == live())
    assert(canon(store, "fmv")("C") == ((2L, 10.0)))
    // and a full replay after recovery stays a no-op
    val v = graft.ops.TxLog.currentVersion(spark, dir)
    sink(b2, 2L)
    assert(graft.ops.TxLog.currentVersion(spark, dir) == v)
    assert(canon(store, "fmv") == live())
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
