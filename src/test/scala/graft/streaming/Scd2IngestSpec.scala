package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Scd2
import graft.sources.ParquetStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class DimRow(k: Long, seg: String, bal: Double)

class Scd2IngestSpec extends SparkSpec {

  private def newStore() =
    new ParquetStore(spark, Files.createTempDirectory("graft_scd2ingest").toString)

  test("streamed dimension epochs build versioned history; epoch replay merges nothing") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val store = newStore()
    val sink = Scd2Ingest.scd2Sink(store, "d", Seq("k"), Seq("seg", "bal"), nShards = 4)
    val src = MemoryStream[DimRow]
    val q = src.toDF().writeStream.foreachBatch(sink).start()
    // epoch 0: three keys; epoch 1: one changed, one new, one untouched
    src.addData(Seq(DimRow(1, "A", 10.0), DimRow(2, "B", 20.0), DimRow(3, "C", 30.0)))
    q.processAllAvailable()
    src.addData(Seq(DimRow(1, "A2", 10.0), DimRow(4, "D", 40.0), DimRow(3, "C", 30.0)))
    q.processAllAvailable()
    q.stop()

    val cur = Scd2.current(store, "d").collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[String]("seg"), r.getAs[Long]("valid_from"))).toMap
    assert(cur == Map(
      1L -> (("A2", 1L)), 2L -> (("B", 0L)), 3L -> (("C", 0L)), 4L -> (("D", 1L))))
    val closed = Scd2.history(store, "d").filter(!col("is_current")).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("seg"),
        r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to")))
    assert(closed.toSeq == Seq((1L, "A", 0L, 1L)))

    // failure-recovery shape: epoch 1 re-delivered — same snapshot,
    // same version stamp — must classify unchanged and touch nothing
    val replay = Scd2.merge(store, "d",
      Seq(DimRow(1, "A2", 10.0), DimRow(4, "D", 40.0), DimRow(3, "C", 30.0)).toDF(),
      Seq("k"), Seq("seg", "bal"), version = 1)
    assert(replay == Scd2.MergeStats(0, 0, 3))
    assert(Scd2.history(store, "d").count() == 5)
  }
}
