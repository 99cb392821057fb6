package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming state observability — the streaming twin of
  * [[graft.similarity.IndexStore.driftReport]]: pure observability for
  * the question that decides whether a stream survives a week at
  * 100 TB — IS THE STATE BOUNDED? Every stateful operator here
  * (watermarked dedup, sessionizers, interval joins) is designed to
  * evict by watermark, so its `num_rows_total` must plateau once the
  * watermark advances past the retention window; monotone growth
  * means a missing watermark or an eviction bug, caught in monitoring
  * instead of in an executor OOM three days in.
  *
  * A [[StreamingQueryListener]] keeps the LATEST per-(query, operator)
  * state metrics (bounded memory: one row per live operator, not per
  * batch) and [[Listener.snapshot]] surfaces them as an ordinary
  * DataFrame — queryable, joinable against thresholds, writable to the
  * warehouse by the same tooling as everything else.
  *
  * {{{
  * val monitor = StateMetrics.attach(spark)
  * // ... streams run ...
  * monitor.snapshot(spark).filter(col("num_rows_total") > threshold)
  * }}}
  */
object StateMetrics {

  case class OperatorState(
      query_id: String,
      run_id: String,
      batch_id: Long,
      operator: String,
      num_rows_total: Long,
      num_rows_updated: Long,
      num_rows_removed: Long,
      memory_used_bytes: Long,
      watermark: String)

  final class Listener extends StreamingQueryListener {
    private val latest =
      new java.util.concurrent.ConcurrentHashMap[(String, Int), OperatorState]()

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val wm = Option(p.eventTime).flatMap(m => Option(m.get("watermark"))).getOrElse("")
      p.stateOperators.zipWithIndex.foreach { case (op, i) =>
        latest.put((p.id.toString, i), OperatorState(
          p.id.toString, p.runId.toString, p.batchId,
          op.operatorName, op.numRowsTotal, op.numRowsUpdated,
          op.numRowsRemoved, op.memoryUsedBytes, wm))
      }
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    /** Current per-operator state metrics as a DataFrame (one row per
      * live stateful operator; empty schema-stable frame when nothing
      * has reported yet).
      */
    def snapshot(spark: SparkSession): DataFrame = {
      import spark.implicits._
      latest.values().asScala.toSeq.toDF()
    }

    /** Persist the snapshot through the ordinary warehouse path —
      * monitoring that survives the session, diffable across runs by
      * the same tooling as every other table. Upserts by
      * (query_id, operator): re-persisting replaces each operator's
      * row (the staged keyed merge), so the table holds one CURRENT
      * row per operator per query, not an unbounded progress log.
      * No-op on an empty snapshot (nothing reported yet) — never
      * clobbers previously persisted state with emptiness.
      */
    def persist(
        spark: SparkSession,
        store: graft.sources.TableStore,
        table: String = "stream_state_metrics"): Unit = {
      val snap = snapshot(spark)
      if (!snap.isEmpty)
        store.appendKeyed(
          snap.withColumn("state_key",
            org.apache.spark.sql.functions.concat_ws(
              "/", org.apache.spark.sql.functions.col("query_id"),
              org.apache.spark.sql.functions.col("operator"))),
          table, "state_key")
    }

    /** Rows breaching state-size thresholds — the page-someone filter
      * over [[snapshot]]: unbounded `num_rows_total` growth (missing
      * watermark / eviction bug) or state memory past what an executor
      * can hold.
      */
    def alerts(
        spark: SparkSession,
        maxRows: Long = 100000000L,
        maxBytes: Long = 4L * 1024 * 1024 * 1024): DataFrame = {
      import org.apache.spark.sql.functions.col
      snapshot(spark)
        .filter(col("num_rows_total") > maxRows || col("memory_used_bytes") > maxBytes)
    }
  }

  /** Register a listener on the session and return it. Detach with
    * `spark.streams.removeListener`.
    */
  def attach(spark: SparkSession): Listener = {
    val l = new Listener
    spark.streams.addListener(l)
    l
  }
}
