package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming pipelines over the `events` feed.
  *
  * The reference is daily batch (SURVEY §1.1 — "near real-time" is
  * aspirational, dags/emission-dag.py:26); this module is the
  * engine's genuine streaming surface: file-source ingestion,
  * watermarked tumbling-window aggregation, streaming dedup, and
  * stateful gap sessionization. The batch counterparts
  * (Queries.qEventsHourly / qSessionize) share the same column logic,
  * so correctness of the shared semantics is oracle-checked in batch
  * while the streaming-only mechanics (watermark, state timeout) are
  * tested with streaming tests.
  */
object EventsStream {

  /** Event schema as produced by `Tables.events` (micros timestamps). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of parquet event files —
    * the S1/S3 "incoming directory" pattern done the Spark way
    * (new files are discovered incrementally; `cleanSource`/archiving
    * replaces the reference's shutil.move checkpointing).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "8")
      .parquet(dir)

  /** Watermarked tumbling-window counts — streaming counterpart of
    * Queries.qEventsHourly. Late events beyond 2h are dropped; state
    * for closed windows is evicted automatically.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"),
        col("cnt"),
        col("sum_value"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * at-least-once upstream → effectively-once downstream with
    * bounded state.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join (click-through attribution shape):
    * each left event pairs with same-user right events landing within
    * `maxGapSecs` AFTER it. Both sides are watermarked and the join
    * condition bounds event time in BOTH directions, which is exactly
    * what Spark needs to prove state is discardable — each side's
    * buffered rows are dropped once the other side's watermark passes
    * the interval, so state stays proportional to (rate × gap), not to
    * stream history.
    *
    * `joinType`:
    *  - "inner" (default): left events with no match within the gap
    *    expire silently;
    *  - "left_outer": an unmatched left emits once, null-padded on the
    *    right columns, when the watermark passes the end of its
    *    interval (click-through attribution usually needs the
    *    unmatched impression row — that IS the no-click signal). Same
    *    bounded state: the outer row is produced at state-eviction
    *    time, so nothing is retained longer than the inner join would
    *    retain it.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      maxGapSecs: Long = 600,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got '$joinType'")
    val l = left
      .select(col("user_id"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("event_id").as("l_id"))
      .withWatermark("l_ts", s"$maxGapSecs seconds")
    val r = right
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_type").as("r_type"), col("event_id").as("r_id"))
      .withWatermark("r_ts", s"$maxGapSecs seconds")
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGapSecs SECONDS"),
      joinType)
      .select(col("user_id"), col("l_id"), col("l_ts"), col("l_type"),
        col("r_id"), col("r_ts"), col("r_type"))
  }

  // ------------------------------------------------------ sessionization

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  case class SessState(startUs: Long, endUs: Long, n: Long, total: Double)

  /** Gap-based sessionization with event-time state timeout — the
    * streaming counterpart of Queries.qSessionize (30-min inactivity
    * gap). State per user is one small struct; a session is emitted
    * when a gap is observed in-stream or when the watermark passes
    * `gap` past its last event (timeout).
    */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    def toTs(us: Long) = new Timestamp(us / 1000)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, toTs(s.startUs), toTs(s.endUs), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000
              cur match {
                case Some(s) if us - s.endUs <= gapUs =>
                  cur = Some(SessState(s.startUs, math.max(s.endUs, us), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, toTs(s.startUs), toTs(s.endUs), s.n, s.total)
                  cur = Some(SessState(us, us, 1, e.value))
                case None =>
                  cur = Some(SessState(us, us, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes.toLong * 60 * 1000)
            }
            closed.reverse.iterator
          }
      }
  }

  /** Gap sessionization on the Spark 4 `transformWithState` API —
    * the successor of flatMapGroupsWithState: explicit typed state
    * handles (`ValueState`), first-class event-time timers, RocksDB
    * state store. Semantics match [[sessionize]]; kept side by side
    * so either engine generation can run the operator.
    *
    * Timer discipline: each batch re-registers a timer at
    * (session end + gap); earlier timers from extended sessions still
    * fire but are ignored unless the session really has been idle for
    * the full gap at expiry (the stale-timer guard) — the standard
    * pattern, avoiding per-key timer bookkeeping.
    */
  class SessionizeProcessor(gapMinutes: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Session] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues}
    import org.apache.spark.sql.{Encoder, Encoders}

    private val gapUs = gapMinutes.toLong * 60 * 1000000
    private val gapMs = gapMinutes.toLong * 60 * 1000
    @transient private var sess: org.apache.spark.sql.streaming.ValueState[SessState] = _

    private def toTs(us: Long) = new Timestamp(us / 1000)
    private def emit(userId: Long, s: SessState) =
      Session(userId, toTs(s.startUs), toTs(s.endUs), s.n, s.total)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val enc: Encoder[SessState] = Encoders.product[SessState]
      sess = getHandle.getValueState[SessState]("sess", enc, TTLConfig.NONE)
    }

    override def handleInputRows(
        userId: Long, rows: Iterator[Event], tv: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var closed = List.empty[Session]
      var cur = if (sess.exists()) Some(sess.get()) else None
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000
        cur match {
          case Some(s) if us - s.endUs <= gapUs =>
            cur = Some(SessState(s.startUs, math.max(s.endUs, us), s.n + 1, s.total + e.value))
          case Some(s) =>
            closed ::= emit(userId, s)
            cur = Some(SessState(us, us, 1, e.value))
          case None =>
            cur = Some(SessState(us, us, 1, e.value))
        }
      }
      cur.foreach { s =>
        sess.update(s)
        getHandle.registerTimer(s.endUs / 1000 + gapMs)
      }
      closed.reverse.iterator
    }

    override def handleExpiredTimer(
        userId: Long, tv: TimerValues, info: ExpiredTimerInfo): Iterator[Session] = {
      if (sess.exists()) {
        val s = sess.get()
        if (info.getExpiryTimeInMs >= s.endUs / 1000 + gapMs) {
          sess.clear()
          Iterator.single(emit(userId, s))
        } else Iterator.empty // stale timer: the session was extended
      } else Iterator.empty
    }
  }

  /** [[sessionize]] on the transformWithState engine. Requires the
    * RocksDB state store provider (set in the session conf).
    */
  def sessionizeTws(
      events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionizeProcessor(gapMinutes),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  case class FunnelUser(user_id: Long, anchor: Timestamp, steps_completed: Int)
  case class FunnelBuf(anchorUs: Long, events: Seq[(Long, Int)])

  /** Streaming anchored funnel — [[graft.ops.EventAnalytics.funnel]]'s
    * semantics emitted per user when the watermark passes the user's
    * anchor deadline (first step-1 event + window): exactly the
    * sessionizeTws discipline, on `transformWithState` with event-time
    * timers.
    *
    * Out-of-order safety without ordered ingestion: funnel-step events
    * BUFFER in state until the deadline timer fires, then the batch
    * min-chain runs over the sorted buffer — so a late-but-in-watermark
    * click between two already-seen events lands exactly where batch
    * semantics put it. The anchor (min step-1 ts) can only DECREASE,
    * so events past the current deadline are permanently disqualified
    * and pruned on arrival; the buffer is bounded by the funnel-step
    * event volume inside one window per user (the interval-join state
    * bound), and users who never produce a step-1 event keep at most
    * the watermark's worth of other-step events (pruned against the
    * watermark on every batch).
    *
    * Timer discipline: a timer registers at (anchor + window); an
    * anchor decrease registers an EARLIER timer — the first timer at
    * or past the CURRENT deadline finalizes and clears, later stale
    * timers find no state (the sessionizeTws stale-timer guard,
    * inverted for a deadline that only moves earlier).
    */
  class FunnelProcessor(steps: Seq[String], windowSecs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, FunnelUser] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues}
    import org.apache.spark.sql.{Encoder, Encoders}

    private val windowUs = windowSecs * 1000000L
    private val stepIdx = steps.zipWithIndex.toMap
    @transient private var buf: org.apache.spark.sql.streaming.ValueState[FunnelBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val enc: Encoder[FunnelBuf] = Encoders.product[FunnelBuf]
      buf = getHandle.getValueState[FunnelBuf]("funnel", enc, TTLConfig.NONE)
    }

    override def handleInputRows(
        userId: Long, rows: Iterator[Event], tv: TimerValues): Iterator[FunnelUser] = {
      val incoming = rows.flatMap(e =>
        stepIdx.get(e.event_type).map(i => (e.ts.getTime * 1000, i))).toSeq
      if (incoming.isEmpty) return Iterator.empty
      val cur = if (buf.exists()) buf.get() else FunnelBuf(Long.MaxValue, Nil)
      val anchor = math.min(cur.anchorUs,
        incoming.filter(_._2 == 0).map(_._1).minOption.getOrElse(Long.MaxValue))
      val all = (cur.events ++ incoming)
        // past-deadline events can never qualify (the anchor only
        // decreases); anchorless users prune against the watermark —
        // a step-1 event can still arrive only inside the lateness
        // allowance, so older non-step-1 events are dead weight
        .filter { case (us, i) =>
          if (anchor < Long.MaxValue) us <= anchor + windowUs || i == 0
          else i == 0 || us >= tv.getCurrentWatermarkInMs() * 1000 - windowUs
        }
      buf.update(FunnelBuf(anchor, all))
      if (anchor < Long.MaxValue)
        getHandle.registerTimer((anchor + windowUs) / 1000 + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(
        userId: Long, tv: TimerValues, info: ExpiredTimerInfo): Iterator[FunnelUser] = {
      if (!buf.exists()) return Iterator.empty
      val s = buf.get()
      if (s.anchorUs == Long.MaxValue ||
        info.getExpiryTimeInMs < (s.anchorUs + windowUs) / 1000 + 1)
        return Iterator.empty // stale: the anchor moved earlier
      buf.clear()
      val deadline = s.anchorUs + windowUs
      val sorted = s.events.sorted
      var prev = s.anchorUs
      var done = 1
      var i = 1
      while (i < steps.size) {
        val next = sorted.collectFirst {
          case (us, idx) if idx == i && us > prev && us <= deadline => us
        }
        next match {
          case Some(us) => prev = us; done += 1; i += 1
          case None => i = steps.size
        }
      }
      Iterator.single(FunnelUser(userId, new Timestamp(s.anchorUs / 1000), done))
    }
  }

  /** [[FunnelProcessor]] wired: watermarked, keyed by user. The
    * watermark delay bounds how late a funnel event may arrive AND
    * how long anchorless users retain non-anchor events.
    */
  def funnelStream(
      events: Dataset[Event],
      steps: Seq[String],
      windowSecs: Long,
      lateness: String = "10 minutes"): Dataset[FunnelUser] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(steps, windowSecs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Incremental warehouse maintenance from a stream: each micro-batch
    * MERGEs into a parquet table by key via foreachBatch +
    * ParquetUpsert — the streaming version of the reference's
    * idempotent append protocol (exactly-once per key: replays of a
    * batch re-merge the same rows).
    */
  def upsertSink(
      events: DataFrame,
      tablePath: String,
      keys: Seq[String],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.ParquetUpsert.mergeByKey(
          batch.sparkSession, tablePath, batch.toDF(), keys)
        ()
      }
      .start()

  /** Run the hourly-count stream over `inDir` to completion
    * (AvailableNow) writing a memory sink; returns the collected
    * result — used by tests and as a library utility for backfills.
    */
  def runHourlyCountsOnce(spark: SparkSession, inDir: String, name: String): DataFrame = {
    val q = hourlyCounts(readEventStream(spark, inDir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
