package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import EventsStream._

class StateMetricsSpec extends SparkSpec {

  test("state metrics surface bounded sessionizer state; eviction shows as removals") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val monitor = StateMetrics.attach(spark)
    try {
      val t0 = 1700000000000L
      def ev(id: Long, user: Long, offsetMin: Long, v: Double) =
        Event(id, new Timestamp(t0 + offsetMin * 60000), user, "click", v)

      val input = MemoryStream[Event]
      val q = sessionize(input.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("metrics_test")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      input.addData(ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0), ev(3, 2, 5, 3.0))
      q.processAllAvailable()
      val mid = monitor.snapshot(spark).collect()
      assert(mid.nonEmpty, "no state metrics reported")
      val midRows = mid.map(_.getAs[Long]("num_rows_total")).max
      assert(midRows >= 1, s"sessionizer state invisible: ${mid.mkString(", ")}")

      // far-future event advances the watermark: open sessions flush,
      // state PLATEAUS instead of growing — the bounded-state signal
      // the monitor exists to show
      input.addData(ev(4, 3, 600, 8.0))
      q.processAllAvailable()
      input.addData(ev(5, 3, 1200, 9.0))
      q.processAllAvailable()
      q.stop()
      val end = monitor.snapshot(spark).collect()
      val endTotal = end.map(_.getAs[Long]("num_rows_total")).max
      assert(endTotal <= midRows + 1,
        s"state grew without bound: $midRows -> $endTotal")
      // schema carries the operator identity + memory for thresholds
      val row = end.head
      assert(row.getAs[String]("operator").nonEmpty)
      assert(row.getAs[Long]("memory_used_bytes") >= 0)
      assert(row.getAs[String]("query_id").nonEmpty)

      // persisted monitoring survives the session: snapshot lands in a
      // warehouse table, and re-persisting UPSERTS by
      // (query_id, operator) — one current row per operator, not a log
      val store = new graft.sources.ParquetStore(spark,
        java.nio.file.Files.createTempDirectory("graft_statemetrics").toString)
      monitor.persist(spark, store)
      val once = store.read("stream_state_metrics").collect()
      assert(once.length == end.length)
      monitor.persist(spark, store)
      val twice = store.read("stream_state_metrics")
      assert(twice.count() == once.length, "re-persist must replace, not append")
      assert(twice.select("state_key").distinct().count() == once.length)

      // threshold alerts: this tiny stream breaches nothing at real
      // thresholds, everything at absurd ones
      assert(monitor.alerts(spark).isEmpty)
      assert(monitor.alerts(spark, maxRows = -1, maxBytes = -1).count() == end.length)
    } finally spark.streams.removeListener(monitor)
  }
}
