package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** SELF-HEALING RESTART for graft-cdc pipelines — the retry half of
  * the mid-stream schema-evolution contract. The source's side is
  * fail-with-fix: an ADD COLUMN / mapped RENAME on the table under a
  * running stream fails the evolution batch (frozen-schema contract —
  * silently projecting would drop the new column's values), leaves
  * the offset range uncommitted, and names the restart as the fix
  * ([[org.apache.spark.sql.graft.ChangeFeedSource]]). That contract
  * is correct but pages a human on every evolving streamed table;
  * this supervisor closes the loop: when the query dies with the
  * evolution failure, it recreates the query from the SAME
  * checkpoint via the caller's `start` thunk — recreating the source
  * re-resolves the schema at the CURRENT pin — and the uncommitted
  * range redelivers under the new schema. No loss (the range never
  * committed), no duplicate (the checkpoint cursor is the log
  * cursor), no human. Any NON-evolution failure rethrows unchanged:
  * auto-restarting a genuine bug would turn a crash into a silent
  * hot loop.
  *
  * The failure is recognized by TYPE
  * ([[org.apache.spark.sql.graft.SchemaEvolvedException]]) anywhere
  * in the cause chain — query-manager exceptions arrive wrapped in
  * [[org.apache.spark.sql.streaming.StreamingQueryException]].
  *
  * `maxRestarts` bounds evolution restarts over the supervised
  * lifetime: a source evolving faster than the stream drains (or a
  * sink that cannot accept the widened schema, re-failing every
  * redelivery) must eventually surface to an operator instead of
  * flapping forever.
  */
final class CdcSupervisor(
    start: () => StreamingQuery, maxRestarts: Int = 8) {

  private var q: StreamingQuery = start()
  private var restartCount = 0

  /** Evolution restarts performed so far. */
  def restarts: Int = restartCount

  /** The live query (changes identity across a restart). */
  def query: StreamingQuery = q

  private def restartOrRethrow(t: Throwable): Unit = {
    if (!CdcSupervisor.isEvolutionFailure(t)) throw t
    if (restartCount >= maxRestarts)
      throw new IllegalStateException(
        s"graft-cdc supervisor: $maxRestarts evolution restarts " +
          "exhausted — the source is evolving faster than the stream " +
          "drains, or the sink cannot adopt the new schema", t)
    try q.stop() catch { case _: Throwable => () }
    restartCount += 1
    q = start() // schema re-resolves at the source's CURRENT pin
  }

  /** Drain everything currently available, healing through any
    * number (≤ maxRestarts) of mid-stream evolutions — the test-and-
    * batch-drain surface. Returns when the stream is caught up.
    */
  def processAllAvailable(): Unit = {
    var done = false
    while (!done) {
      try { q.processAllAvailable(); done = true }
      catch { case t: Throwable => restartOrRethrow(t) }
    }
  }

  /** Block until the query stops for a NON-evolution reason (clean
    * stop, or a genuine failure, which rethrows) — the long-running
    * production surface.
    */
  def awaitTermination(): Unit = {
    var done = false
    while (!done) {
      try { q.awaitTermination(); done = true }
      catch { case t: Throwable => restartOrRethrow(t) }
    }
  }

  def stop(): Unit = q.stop()
}

object CdcSupervisor {

  /** Is `t` (or anything in its cause chain) the graft-cdc
    * mid-stream evolution failure?
    */
  def isEvolutionFailure(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).exists {
      case _: org.apache.spark.sql.graft.SchemaEvolvedException => true
      case _ => false
    }
}
