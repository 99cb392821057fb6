package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.{DbLog, DeleteWhere, TxLog, UpsertWhere}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class SinkRow(k: Long, v: String)
case class CdcRow(k: Long, v: String, seq: Long)

class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  test("format(graft) append: each epoch is one committed log version; snapshot equals the union") {
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("gsink").toString + "/t"
    val src = MemoryStream[SinkRow]
    val q = src.toDF().writeStream.format("graft")
      .option("path", dir)
      .option("checkpointLocation",
        Files.createTempDirectory("gsink_ck").toString)
      .start()
    try {
      src.addData(SinkRow(1, "a"), SinkRow(2, "b"))
      q.processAllAvailable()
      src.addData(SinkRow(3, "c"))
      q.processAllAvailable()
      assert(same(TxLog.snapshot(spark, dir),
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")))
      // each epoch landed as its own version, stamped for replay
      assert(TxLog.txnCommitted(spark, dir, "epoch_0"))
      assert(TxLog.txnCommitted(spark, dir, "epoch_1"))
      // the committed table is a first-class log table: time travel
      assert(TxLog.snapshot(spark, dir,
        TxLog.currentVersion(spark, dir) - 1).count() == 2)
    } finally q.stop()
  }

  test("format(graft) merge: SEQUENCE-BY netting + keyed upsert per epoch") {
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("gsink").toString + "/t"
    val src = MemoryStream[CdcRow]
    val q = src.toDF().writeStream.format("graft")
      .option("path", dir).option("mode", "merge")
      .option("keys", "k").option("sequenceBy", "seq")
      .option("checkpointLocation",
        Files.createTempDirectory("gsink_ck").toString)
      .start()
    try {
      src.addData(CdcRow(1, "a", 1), CdcRow(2, "b", 1))
      q.processAllAvailable()
      // epoch 1: key 1 updated twice (seq 3 wins), key 3 new
      src.addData(CdcRow(1, "a2", 2), CdcRow(1, "a3", 3), CdcRow(3, "c", 2))
      q.processAllAvailable()
      assert(same(TxLog.snapshot(spark, dir),
        Seq((1L, "a3"), (2L, "b"), (3L, "c")).toDF("k", "v")))
    } finally q.stop()
  }

  test("format(graft) route: discriminator fan-out into a DbLog database, one commit per epoch") {
    implicit val sc = spark.sqlContext
    val db = Files.createTempDirectory("gsink").toString + "/db"
    val src = MemoryStream[(String, Long)]
    val q = src.toDF().toDF("t", "x").writeStream.format("graft")
      .option("path", db).option("mode", "route").option("tableCol", "t")
      .option("checkpointLocation",
        Files.createTempDirectory("gsink_ck").toString)
      .start()
    try {
      src.addData(("orders", 1L), ("audit", 100L), ("orders", 2L))
      q.processAllAvailable()
      assert(DbLog.snapshot(spark, db, "orders").as[Long].collect().toSet ==
        Set(1L, 2L))
      assert(DbLog.snapshot(spark, db, "audit").as[Long].collect().toSet ==
        Set(100L))
    } finally q.stop()
  }

  test("graft-cdc -> graft/apply: end-to-end log replication in pure Spark API, deletes included") {
    val srcDir = Files.createTempDirectory("gsink").toString + "/src"
    val dstDir = Files.createTempDirectory("gsink").toString + "/dst"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .repartition(2).write.parquet(srcDir)
    TxLog.convert(spark, srcDir)
    val q = spark.readStream.format("graft-cdc")
      .option("path", srcDir).option("startingVersion", "0").load()
      .writeStream.format("graft")
      .option("path", dstDir).option("mode", "apply").option("keys", "k")
      .option("checkpointLocation",
        Files.createTempDirectory("gsink_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(same(TxLog.snapshot(spark, dstDir), TxLog.snapshot(spark, srcDir)))
      // mutate the source while the pipeline runs: update + delete
      UpsertWhere.byKeys(spark, srcDir, "k",
        Seq((2L, "B2"), (9L, "i")).toDF("k", "v"))
      DeleteWhere.byKeys(spark, srcDir, "k", Seq(1L))
      q.processAllAvailable()
      assert(same(TxLog.snapshot(spark, dstDir), TxLog.snapshot(spark, srcDir)))
      assert(TxLog.snapshot(spark, dstDir).count() == 3) // 2,3,9
    } finally q.stop()
  }

  test("append epochs replay as no-ops across a checkpoint restart (exactly-once)") {
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("gsink").toString + "/t"
    val ck = Files.createTempDirectory("gsink_ck").toString
    val src1 = MemoryStream[SinkRow]
    val q1 = src1.toDF().writeStream.format("graft")
      .option("path", dir).option("checkpointLocation", ck).start()
    src1.addData(SinkRow(1, "a"))
    q1.processAllAvailable()
    q1.stop()
    assert(TxLog.snapshot(spark, dir).count() == 1)
    // a fresh query on the same checkpoint: the committed epoch is
    // not re-landed; only new data arrives
    val src2 = MemoryStream[SinkRow]
    src2.addData(SinkRow(1, "a")) // the recovered batch replays this
    val q2 = src2.toDF().writeStream.format("graft")
      .option("path", dir).option("checkpointLocation", ck).start()
    try {
      src2.addData(SinkRow(2, "b"))
      q2.processAllAvailable()
      assert(TxLog.snapshot(spark, dir).count() == 2)
    } finally q2.stop()
  }

  test("option branch: the stream stages epochs on a branch; publish flips main atomically") {
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("gsink").toString + "/t"
    Seq((0L, "base")).toDF("k", "v").write.parquet(dir)
    TxLog.convert(spark, dir)
    TxLog.createBranch(spark, dir, "staging")
    val src = MemoryStream[SinkRow]
    val q = src.toDF().writeStream.format("graft")
      .option("path", dir).option("branch", "staging")
      .option("checkpointLocation",
        Files.createTempDirectory("gsink_ck").toString)
      .start()
    try {
      src.addData(SinkRow(1, "a"), SinkRow(2, "b"))
      q.processAllAvailable()
      src.addData(SinkRow(3, "c"))
      q.processAllAvailable()
      // main never moved; the branch accumulated both epochs
      assert(TxLog.currentVersion(spark, dir) == 0)
      assert(TxLog.snapshot(spark, dir).count() == 1)
      assert(TxLog.withBranch(spark, dir, "staging")(
        TxLog.snapshot(spark, dir).count()) == 4)
    } finally q.stop()
    // audit passed → publish consumes the branch; main flips in ONE commit
    val v = TxLog.publishBranch(spark, dir, "staging")
    assert(v == 1)
    assert(same(TxLog.snapshot(spark, dir),
      Seq((0L, "base"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")))
  }

  test("option validation names the missing piece") {
    val e1 = intercept[IllegalArgumentException] {
      spark.readStream.format("rate").load()
        .writeStream.format("graft").option("mode", "merge")
        .option("path", "/tmp/x")
        .option("checkpointLocation",
          Files.createTempDirectory("gsink_ck").toString)
        .start()
    }
    assert(e1.getMessage.contains("keys"))
  }
}
