package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventsStream.{Event, funnelStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class FunnelStreamSpec extends SparkSpec {

  private val t0 = 1700000000000L
  private def ev(id: Long, user: Long, offsetMin: Long, tpe: String) =
    Event(id, new Timestamp(t0 + offsetMin * 60000), user, tpe, 1.0)

  test("streamed funnel equals the batch funnel, with out-of-order in-watermark arrivals") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val steps = Seq("view", "click", "purchase")
      val windowSecs = 60L * 60 // 1 hour
      // user 1 completes; user 2 skips click; user 3 purchases too
      // late; user 4 never views; user 5's click precedes the view
      val batch1 = Seq(
        ev(1, 1, 0, "view"),
        ev(4, 2, 0, "view"),
        ev(6, 3, 0, "view"), ev(7, 3, 10, "click"),
        ev(9, 4, 0, "click"), ev(10, 4, 10, "purchase"),
        ev(11, 5, 10, "view"), ev(12, 5, 5, "click"))
      // batch 2 carries user 1's click at offset 10 — LATE (batch 1's
      // max event time is 15' → watermark 5') but inside the lateness
      // allowance, and EARLIER in event time than the purchase that
      // arrives beside it: the buffered-until-deadline design must
      // slot it exactly where batch semantics put it
      val batch2 = Seq(
        ev(2, 1, 10, "click"), ev(3, 1, 20, "purchase"),
        ev(5, 2, 30, "purchase"),
        ev(8, 3, 120, "purchase"),
        ev(13, 6, 15, "noise")) // lifts batch-1 max ts to 15'
      val all = batch1 ++ batch2

      val input = MemoryStream[Event]
      val q = funnelStream(input.toDS(), steps, windowSecs, lateness = "10 minutes")
        .writeStream.format("memory").queryName("funnel_tws")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

      input.addData(batch1 :+ ev(13, 6, 15, "noise"): _*)
      q.processAllAvailable()
      input.addData(batch2.filterNot(_.event_id == 13): _*)
      q.processAllAvailable()
      // sentinel far in the future advances the watermark past every
      // deadline → timers fire
      input.addData(ev(99, 999, 100000, "noise"))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("funnel_tws")
        .filter(col("user_id") < 100)
        .collect().map(r => r.getLong(0) ->
          r.getInt(r.fieldIndex("steps_completed"))).toMap

      val batch = graft.ops.EventAnalytics.funnel(
        all.toDF(), steps, windowSecs)
        .collect().map(r => r.getLong(0) ->
          r.getInt(r.fieldIndex("steps_completed"))).toMap

      assert(got == batch, s"stream $got vs batch $batch")
      assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 5L -> 1))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
