package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class EventsStreamSpec extends SparkSpec {
  import EventsStream._

  test("streaming hourly counts equal the batch result over the same files") {
    // stage events (nanos→micros) into a stream-source directory
    val dir = Files.createTempDirectory("graft_stream_in").toString
    graft.Tables.events(spark, sf("events")).write.mode("overwrite").parquet(dir)

    val streamed = runHourlyCountsOnce(spark, dir, "hourly_test")
      .collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("sum_value")))
      .toMap

    val batch = graft.Queries.qEventsHourly(spark, sf("events"))
      .collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("sum_value")))
      .toMap

    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (k, (cnt, sum)) =>
      assert(streamed(k)._1 == cnt, s"count mismatch at $k")
      assert(math.abs(streamed(k)._2 - sum) < 0.02, s"sum mismatch at $k")
    }
  }

  test("stream-stream interval join pairs same-user events within the gap, state bounded") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, user: Long, offsetSec: Long, typ: String) =
      Event(id, new Timestamp(t0 + offsetSec * 1000), user, typ, 1.0)

    val impressions = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = intervalJoin(impressions.toDF(), clicks.toDF(), maxGapSecs = 60)
      .writeStream.format("memory").queryName("ij_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    impressions.addData(ev(1, 1, 0, "imp"), ev(2, 2, 0, "imp"))
    clicks.addData(
      ev(101, 1, 30, "click"),  // within 60s of imp 1 -> joins
      ev(102, 2, 120, "click"), // 120s after imp 2 -> outside the gap
      ev(103, 3, 30, "click"))  // no matching impression user
    q.processAllAvailable()
    // advance both watermarks far past the interval: expired state flushes
    impressions.addData(ev(9, 9, 10000, "imp"))
    clicks.addData(ev(109, 9, 20000, "click"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("ij_test")
      .select("user_id", "l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 101L)), s"got $out")
  }

  test("left_outer interval join emits null-padded unmatched lefts after the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, user: Long, offsetSec: Long, typ: String) =
      Event(id, new Timestamp(t0 + offsetSec * 1000), user, typ, 1.0)

    val impressions = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = intervalJoin(impressions.toDF(), clicks.toDF(),
      maxGapSecs = 60, joinType = "left_outer")
      .writeStream.format("memory").queryName("ij_outer_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    impressions.addData(ev(1, 1, 0, "imp"), ev(2, 2, 0, "imp"))
    clicks.addData(
      ev(101, 1, 30, "click"),  // within 60s of imp 1 -> joins
      ev(102, 2, 120, "click")) // 120s after imp 2 -> outside the gap
    q.processAllAvailable()
    // advance both watermarks past imp 2's interval; the unmatched-left
    // row is emitted at state eviction, which lands in the NEXT batch
    impressions.addData(ev(9, 9, 10000, "imp"))
    clicks.addData(ev(109, 9, 20000, "click"))
    q.processAllAvailable()
    impressions.addData(ev(10, 9, 30000, "imp"))
    clicks.addData(ev(110, 9, 40000, "click"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("ij_outer_test")
      .select("user_id", "l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(out.contains((1L, 1L, 101L)), s"matched pair missing: $out")
    assert(out.contains((2L, 2L, -1L)), s"null-padded unmatched left missing: $out")
    // the out-of-gap click must never attach to imp 2
    assert(!out.exists(o => o._2 == 2L && o._3 > 0), s"false match: $out")
  }

  test("sessionize: gap closes sessions in-stream, watermark timeout flushes open ones") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val t0 = 1700000000000L // fixed epoch millis
    def ev(id: Long, user: Long, offsetMin: Long, v: Double) =
      Event(id, new Timestamp(t0 + offsetMin * 60000), user, "click", v)

    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: user 1 — two events 10min apart, then a 60-min gap event
    input.addData(ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0), ev(3, 1, 70, 4.0))
    q.processAllAvailable()
    // batch 2: far-future event advances the watermark → open session times out
    input.addData(ev(4, 2, 600, 8.0))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sess_test")
      .filter(col("user_id") === 1).orderBy("session_start").collect()
    assert(sessions.length == 2, s"got ${sessions.length} sessions")
    assert(sessions(0).getAs[Long]("n_events") == 2)
    assert(sessions(0).getAs[Double]("sum_value") == 3.0)
    assert(sessions(1).getAs[Long]("n_events") == 1)
    assert(sessions(1).getAs[Double]("sum_value") == 4.0)
  }

  test("sessionizeTws (transformWithState) matches flatMapGroupsWithState semantics") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // transformWithState requires the RocksDB state store
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = 1700000000000L
      def ev(id: Long, user: Long, offsetMin: Long, v: Double) =
        Event(id, new Timestamp(t0 + offsetMin * 60000), user, "click", v)

      val input = MemoryStream[Event]
      val q = sessionizeTws(input.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("sess_tws_test")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

      input.addData(ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0), ev(3, 1, 70, 4.0))
      q.processAllAvailable()
      input.addData(ev(4, 2, 600, 8.0)) // advances watermark → timer flush
      q.processAllAvailable()
      q.stop()

      val sessions = spark.table("sess_tws_test")
        .filter(col("user_id") === 1).orderBy("session_start").collect()
      assert(sessions.length == 2, s"got ${sessions.length} sessions")
      assert(sessions(0).getAs[Long]("n_events") == 2)
      assert(sessions(0).getAs[Double]("sum_value") == 3.0)
      assert(sessions(1).getAs[Long]("n_events") == 1)
      assert(sessions(1).getAs[Double]("sum_value") == 4.0)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("upsertSink: checkpointed restart picks up new files, no duplicates") {
    val in = Files.createTempDirectory("graft_upsert_in").toString
    val table = Files.createTempDirectory("graft_upsert_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_upsert_ck").toString

    val events = graft.Tables.events(spark, sf("events"))
    // first 2 files of events
    events.filter(col("event_id") < 500).write.parquet(s"$in/batch1")
    val src1 = spark.readStream.schema(eventSchema).parquet(s"$in/*")
    upsertSink(src1, table, Seq("event_id"), ckpt).awaitTermination()
    val n1 = spark.read.parquet(table).count()
    assert(n1 == 500L)

    // restart with one more file (overlapping ids 400-599: replays merge)
    events.filter(col("event_id") >= 400 && col("event_id") < 600)
      .write.parquet(s"$in/batch2")
    val src2 = spark.readStream.schema(eventSchema).parquet(s"$in/*")
    upsertSink(src2, table, Seq("event_id"), ckpt).awaitTermination()
    val out = spark.read.parquet(table)
    assert(out.count() == 600L) // no duplicates from the overlap
    assert(out.select("event_id").distinct().count() == 600L)
  }

  test("streaming dedup drops duplicate event_ids within watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val t0 = 1700000000000L
    val input = MemoryStream[Event]
    val q = dedupEvents(input.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    input.addData(
      Event(1, new Timestamp(t0), 1, "a", 1.0),
      Event(1, new Timestamp(t0), 1, "a", 1.0),
      Event(2, new Timestamp(t0 + 1000), 1, "b", 2.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_test").count() == 2)
  }
}
