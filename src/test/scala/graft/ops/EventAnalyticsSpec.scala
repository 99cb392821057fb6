package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {

  private def ts(m: Long) = new Timestamp(m * 60000L) // minutes → epoch

  test("funnel: anchored ordering, window deadline, per-user completion") {
    import spark.implicits._
    val events = Seq(
      // A completes in order within the window
      (1L, ts(0), "view"), (1L, ts(10), "click"), (1L, ts(20), "purchase"),
      // B skips click — purchase can't count without the middle step
      (2L, ts(0), "view"), (2L, ts(30), "purchase"),
      // C clicks in window but purchases after the 60-min deadline
      (3L, ts(0), "view"), (3L, ts(10), "click"), (3L, ts(120), "purchase"),
      // D never views — not in the funnel at all
      (4L, ts(0), "click"), (4L, ts(10), "purchase"),
      // E's click precedes the anchor view — order violated
      (5L, ts(10), "view"), (5L, ts(5), "click"),
      // F: anchor is the FIRST view; the qualifying click follows it
      (6L, ts(0), "view"), (6L, ts(50), "view"), (6L, ts(40), "click")
    ).toDF("user_id", "ts", "event_type")

    val f = EventAnalytics.funnel(events, Seq("view", "click", "purchase"),
      windowSecs = 3600)
    val byUser = f.collect()
      .map(r => r.getLong(0) -> r.getInt(r.fieldIndex("steps_completed"))).toMap
    assert(byUser == Map(1L -> 3, 2L -> 1, 3L -> 2, 5L -> 1, 6L -> 2))

    val counts = EventAnalytics.funnelCounts(f, 3).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(1 -> 5L, 2 -> 3L, 3 -> 1L))
  }

  test("funnelAny beats the anchored funnel exactly when a later anchor completes") {
    import spark.implicits._
    val events = Seq(
      // first view at 0 can't complete (click at 90' > 60' window) —
      // but the view at 80' anchors a full chain: anchored says 1,
      // any-chain says 3
      (1L, ts(0), "view"), (1L, ts(80), "view"),
      (1L, ts(90), "click"), (1L, ts(100), "purchase"),
      // single-anchor user: both variants agree (2 — purchase missing)
      (2L, ts(0), "view"), (2L, ts(10), "click")
    ).toDF("user_id", "ts", "event_type")

    val anchored = EventAnalytics.funnel(events,
      Seq("view", "click", "purchase"), windowSecs = 3600)
      .select("user_id", "steps_completed").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val any = EventAnalytics.funnelAny(events,
      Seq("view", "click", "purchase"), windowSecs = 3600)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(anchored == Map(1L -> 1, 2L -> 2))
    assert(any == Map(1L -> 3, 2L -> 2))
  }

  test("fillGaps: per-key spine, zero fill, forward fill, leading nulls stay null") {
    import spark.implicits._
    val agg = Seq(
      ("a", ts(0), 2L, Some(1.5)), ("a", ts(3), 1L, Some(4.0)),
      ("b", ts(1), 5L, None), ("b", ts(2), 1L, Some(2.0))
    ).toDF("k", "bucket", "n", "v")
    val filled = EventAnalytics.fillGaps(agg, "bucket", stepSecs = 60,
      keyCols = Seq("k"), zeroFillCols = Seq("n"), ffillCols = Seq("v"))
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000L,
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(filled.toSeq == Seq(
      ("a", 0L, 2L, Some(1.5)),
      ("a", 1L, 0L, Some(1.5)), // gap: n zeroed, v carried forward
      ("a", 2L, 0L, Some(1.5)),
      ("a", 3L, 1L, Some(4.0)),
      ("b", 1L, 5L, None),      // leading null: nothing to carry
      ("b", 2L, 1L, Some(2.0))))
  }

  test("fillGaps without keys: single calendar-sized spine") {
    import spark.implicits._
    val agg = Seq((ts(10), 1L), (ts(13), 2L)).toDF("bucket", "n")
    val filled = EventAnalytics.fillGaps(agg, "bucket", stepSecs = 60,
      zeroFillCols = Seq("n"))
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    assert(filled == Seq(1L, 0L, 0L, 2L))
  }
}
