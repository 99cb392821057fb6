package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.{DbLog, DbMv, TxLog}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming star follower ([[DbMvIngest.starFollowSink]]): each
  * micro-batch is one epoch-stamped database transaction + one
  * cursor-guarded star advance — held to the batch
  * [[DbMv.refreshStar]] semantics through the MvIngest crash windows
  * (redelivery over an interleaved external commit; append landed /
  * refresh missed).
  */
class DbMvIngestSpec extends SparkSpec {

  private val view = DbMv.StarView("fact", Seq(("cust", Seq("ck"))),
    groupCols = Seq("seg"), sumCols = Seq("amt"))

  private def newDb(): String = {
    import spark.implicits._
    val db = Files.createTempDirectory("dbmv_stream").toString + "/db"
    DbLog.create(spark, db)
    DbLog.transact(spark, db, "dims")(_.append("cust",
      Seq((10L, "A"), (20L, "B"), (30L, "C")).toDF("ck", "seg")))
    db
  }

  private def canon(db: String) =
    DbMv.readStar(spark, db, "rev").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        math.round(r.getDouble(2) * 100) / 100.0))).toMap

  private def live(db: String) =
    DbLog.snapshot(spark, db, "fact")
      .join(DbLog.snapshot(spark, db, "cust"), Seq("ck"))
      .groupBy("seg").agg(count(lit(1)), sum("amt")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        math.round(r.getDouble(2) * 100) / 100.0))).toMap

  test("streamed epochs keep the star view equal to the live aggregate") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val db = newDb()
    val sink = DbMvIngest.starFollowSink(db, "fact", "rev", view)
    val src = MemoryStream[(Long, Long, Double)]
    val q = src.toDF().toDF("k", "ck", "amt")
      .writeStream.foreachBatch(sink).start()
    src.addData(Seq((1L, 10L, 5.0), (2L, 20L, 7.0)))
    q.processAllAvailable()
    assert(canon(db) == Map("A" -> ((1L, 5.0)), "B" -> ((1L, 7.0))))
    src.addData(Seq((3L, 10L, 2.0), (4L, 30L, 1.0)))
    q.processAllAvailable()
    q.stop()
    assert(canon(db) == live(db))
    assert(canon(db) ==
      Map("A" -> ((2L, 7.0)), "B" -> ((1L, 7.0)), "C" -> ((1L, 1.0))))
  }

  test("crash windows: redelivery over an interleaved external commit nets exactly once") {
    import spark.implicits._
    val db = newDb()
    val sink = DbMvIngest.starFollowSink(db, "fact", "rev", view)
    sink(Seq((1L, 10L, 5.0), (2L, 20L, 7.0)).toDF("k", "ck", "amt"), 0L)
    assert(canon(db) == Map("A" -> ((1L, 5.0)), "B" -> ((1L, 7.0))))
    // CRASH WINDOW 1: epoch 1 ran whole (txn landed, view advanced)
    // but the checkpoint never recorded it. An EXTERNAL multi-table
    // commit interleaves before the redelivery.
    val b1 = Seq((3L, 10L, 2.0), (4L, 30L, 1.0)).toDF("k", "ck", "amt")
    sink(b1, 1L)
    DbLog.transact(spark, db, "external") { txn =>
      txn.append("fact", Seq((9L, 20L, 100.0)).toDF("k", "ck", "amt"))
      txn.upsertKeyed("cust", Seq("ck"), Seq((30L, "MOVED")).toDF("ck", "seg"))
    }
    sink(b1, 1L) // redelivery: txn recognized, advance covers the external window
    assert(canon(db) == live(db),
      "redelivery over an interleaved commit must net to the live aggregate")
    assert(canon(db) == Map("A" -> ((2L, 7.0)), "B" -> ((2L, 107.0)),
      "MOVED" -> ((1L, 1.0))))
    // CRASH WINDOW 2: the epoch's transaction landed but the crash
    // hit before the view advanced — redelivery completes it once
    val b2 = Seq((5L, 10L, 3.0)).toDF("k", "ck", "amt")
    val half = DbLog.begin(spark, db)
    half.append("fact", b2)
    half.commit("stream-epoch-2", txn = Some("dbmv_epoch_fact_2"))
    sink(b2, 2L) // redelivery runs the whole sink
    assert(canon(db) == live(db))
    assert(canon(db)("A") == ((3L, 10.0)))
    // full replay after recovery: txn recognized AND the view's
    // fixpoint gate refuses to commit — version frozen
    val v = TxLog.currentVersion(spark, db)
    sink(b2, 2L)
    assert(TxLog.currentVersion(spark, db) == v)
    assert(canon(db) == live(db))
  }
}
