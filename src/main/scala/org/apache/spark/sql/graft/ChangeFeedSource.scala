package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, GraftShim, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}

import graft.ops.{DbLog, TxLog}

/** `readStream` over a transaction log's change feed — commits become
  * microbatches, no cursor code in the consumer:
  *
  * {{{
  * spark.readStream.format("graft-cdc")
  *   .option("path", dir)                  // TxLog table root
  *   .option("table", "orders")            // optional: DbLog table
  *   .option("startingVersion", "0")       // optional: default = NOW
  *   .load()
  *   .writeStream...                       // rows + _change_type
  * }}}
  *
  * V1 streaming Source (the Delta-source pattern — lives under
  * org.apache.spark.sql for the same `private[sql]` access): OFFSETS
  * ARE LOG VERSIONS, so the checkpoint's cursor is exactly
  * [[TxLog.diffSince]]'s cursor and restart/replay semantics are the
  * log's own. Each microbatch is `diff(start, end]` — the
  * changed-files-only plan, read lazily when the batch executes, DV
  * and schema-pin aware because it IS the batch reader — with
  * `_change_type` (insert/delete) and `_commit_version` (the range's
  * end; a batch spanning several commits nets them, exactly like the
  * batch diff). `startingVersion` replays history from a version
  * (0 = initial snapshot as inserts); omitted, the feed starts at the
  * CURRENT version — new commits only, the tail-the-table default.
  *
  * 100 TB shape: getOffset is one metadata probe (current version);
  * a batch's cost is O(files changed in its range), never O(table).
  * Exactly-once to transactional sinks composes the usual way
  * (foreachBatch + txn-id sinks — [[graft.streaming.TxLogIngest]]).
  */
final class ChangeFeedSourceProvider
    extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangeFeedSource.feedSchema(
      sqlContext.sparkSession, parameters))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(sqlContext.sparkSession, parameters)
}

/** The mid-stream schema-evolution failure ([[ChangeFeedSource]]'s
  * fail-with-fix contract) as a TYPE, so a supervisor can recognize
  * it in a [[org.apache.spark.sql.streaming.StreamingQueryException]]
  * cause chain by class instead of message-matching —
  * [[graft.streaming.CdcSupervisor]] turns it into an automatic
  * restart.
  */
final class SchemaEvolvedException(msg: String)
    extends IllegalStateException(msg)

object ChangeFeedSource {

  private[graft] def feedSchema(
      spark: SparkSession, parameters: Map[String, String]): StructType = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-cdc requires option 'path'"))
    val base = parameters.get("table") match {
      case Some(t) => DbLog.snapshot(spark, path, t).schema
      case None => TxLog.snapshot(spark, path).schema
    }
    val withRowId = // keyless update images ride the stable _row_id
      parameters.get("updateImages").exists(_.toBoolean) &&
        !parameters.get("keys").exists(_.split(",").exists(_.trim.nonEmpty))
    val b2 =
      if (withRowId)
        base.add(graft.ops.RowTracking.Col,
          org.apache.spark.sql.types.LongType)
      else base
    b2.add("_change_type", StringType, nullable = false)
      .add("_commit_version", IntegerType, nullable = false)
  }
}

final class ChangeFeedSource(
    spark: SparkSession, parameters: Map[String, String]) extends Source {

  private val path = parameters("path")
  private val table = parameters.get("table")
  table.foreach(_ => require(DbLog.exists(spark, path),
    s"graft-cdc: $path is not a DbLog database"))
  require(TxLog.exists(spark, path),
    s"graft-cdc: $path is not TxLog-managed")

  /** The feed's FLOOR: the version whose changes are NOT included.
    * `startingVersion` is inclusive (Delta's convention — 0 replays
    * the initial snapshot as inserts), so the floor sits one below
    * it; omitted, the floor is the current version (new commits
    * only).
    */
  private val floorVersion: Int = {
    require(!(parameters.contains("startingVersion") &&
      parameters.contains("startingTimestamp")),
      "graft-cdc: pass startingVersion OR startingTimestamp, not both")
    parameters.get("startingVersion").map(_.toInt - 1)
      .orElse(parameters.get("startingTimestamp").map { ts =>
        // replay every commit AFTER the wall-clock time: versionAsOf
        // gives the newest commit at-or-before it = the floor; a time
        // before the first retained commit replays the whole history
        // (Delta's startingTimestamp convention)
        val millis =
          java.sql.Timestamp.valueOf(ts.replace("T", " ")).getTime
        try TxLog.versionAsOf(spark, path, millis)
        catch { case _: IllegalArgumentException => -1 }
      })
      .getOrElse(TxLog.currentVersion(spark, path))
  }

  /** Rate limit (Delta's maxFilesPerTrigger analog at the version
    * granularity the offsets already use): each microbatch advances
    * at most N commits, so a deep backlog — a replay from
    * startingVersion 0 of a year-old table — drains as bounded
    * batches instead of one giant catch-up diff. Restart-safe: the
    * high-water mark restores from the recovery getBatch call V1
    * sources receive before their first getOffset.
    */
  private val maxVersionsPerBatch: Option[Int] =
    parameters.get("maxVersionsPerBatch").map(_.toInt)
  maxVersionsPerBatch.foreach(n =>
    require(n > 0, s"graft-cdc: maxVersionsPerBatch must be > 0, got $n"))
  private var highWater: Int = floorVersion

  override val schema: StructType =
    ChangeFeedSource.feedSchema(spark, parameters)

  /** The version this stream's frozen schema was derived at. Batches
    * read their diff under `max(schemaPinnedAt, range end)`'s pin —
    * so a RECOVERY batch (range entirely before a restart that picked
    * up an evolution) still aligns to the restarted stream's schema:
    * old files read NULL for added columns and renamed columns
    * resolve through their unchanged physical names.
    */
  private val schemaPinnedAt: Int = TxLog.currentVersion(spark, path)

  private def versionOf(o: Offset): Int = o match {
    case LongOffset(v) => v.toInt
    case s: SerializedOffset => LongOffset(s).offset.toInt
    case other => throw new IllegalArgumentException(
      s"graft-cdc: unexpected offset $other")
  }

  override def getOffset: Option[Offset] = {
    val cur = TxLog.currentVersion(spark, path)
    val capped = maxVersionsPerBatch match {
      case Some(n) => math.min(cur, math.max(highWater, floorVersion) + n)
      case None => cur
    }
    if (capped > floorVersion) Some(LongOffset(capped.toLong)) else None
  }

  /** `keys` opts the feed into ROW-LEVEL UPDATE IMAGES: each
    * microbatch pairs its commits' delete+insert rows by these key
    * columns into update_preimage/update_postimage and stamps every
    * row with ITS OWN commit version ([[TxLog.changes]]) instead of
    * netting the range — the Debezium-consumer fidelity a plain diff
    * feed cannot carry.
    */
  private val keyCols: Seq[String] =
    parameters.get("keys").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))

  /** `updateImages=true` without `keys`: row-tracked tables pair
    * update pre/post images by the stable `_row_id` — the keyless CDC
    * fidelity feed (the batch gains a `_row_id` column). With `keys`
    * present this flag is redundant (keys already select the
    * images path).
    */
  private val rowIdImages: Boolean =
    parameters.get("updateImages").exists(_.toBoolean) && keyCols.isEmpty
  if (rowIdImages) table match {
    case Some(t) =>
      require(graft.ops.RowTracking.enabledTable(spark, path, t),
        s"graft-cdc: updateImages without keys requires per-table row " +
          s"tracking on $path/$t (RowTracking.enableTable)")
    case None =>
      require(graft.ops.RowTracking.enabled(spark, path),
        s"graft-cdc: updateImages without keys requires row tracking on " +
          s"$path (RowTracking.enable / graft_enable_rowtracking)")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(floorVersion)
    val to = versionOf(end)
    highWater = math.max(highWater, to)
    // recovery batches (range before schemaPinnedAt) read under THIS
    // stream's pin; live batches read at their range end — equal
    // unless the source evolved mid-stream, which the guard below
    // turns into an explicit restart instead of silent column loss
    val schemaV = math.max(schemaPinnedAt, to)
    // floor below the log (startingVersion = 0): the batch is the
    // snapshot at `to` as inserts — diff against an empty before-set
    val d =
      if (from < 0) (table match {
        case Some(t) if rowIdImages =>
          graft.ops.RowTracking.readTableAt(spark, path, t, to, schemaV)
            .drop(graft.ops.RowTracking.VerCol)
        case Some(t) =>
          DbLog.snapshot(spark, path, t, to, schemaVersion = schemaV)
        case None if rowIdImages =>
          graft.ops.RowTracking.readAt(spark, path, to, schemaV)
            .drop(graft.ops.RowTracking.VerCol)
        case None =>
          TxLog.snapshot(spark, path, to, schemaVersion = schemaV)
      }).withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(to))
      else if (rowIdImages) table match {
        case Some(t) => DbLog.changes(spark, path, t, from, to, Nil, schemaV)
        case None => TxLog.changes(spark, path, from, to, Nil, schemaV)
      }
      else if (keyCols.nonEmpty) table match {
        case Some(t) =>
          DbLog.changes(spark, path, t, from, to, keyCols, schemaV)
        case None =>
          TxLog.changes(spark, path, from, to, keyCols, schemaV)
      }
      else (table match {
        case Some(t) => DbLog.diff(spark, path, t, from, to, schemaV)
        case None => TxLog.diff(spark, path, from, to, schemaV)
      }).withColumn("_commit_version", lit(to))
    // MID-STREAM SCHEMA EVOLUTION: the source's schema is frozen at
    // query start (Structured Streaming's contract). If the table
    // evolved under the running stream — ADD COLUMN widens the diff,
    // a mapped RENAME respells it — silently projecting back onto the
    // frozen schema would DROP the new column's values from every
    // batch until someone notices. Fail the batch with the fix
    // instead: this offset range is uncommitted, so a restart from
    // the same checkpoint redelivers it under the new schema — no
    // loss, no gap (the Delta-source contract).
    val want = schema.fieldNames
    val gotCols = d.columns
    if (gotCols.toSet != want.toSet)
      throw new SchemaEvolvedException(
        s"graft-cdc: the schema of $path${table.map("/" + _).getOrElse("")} " +
          s"changed under the running stream (batch columns: " +
          s"${gotCols.filterNot(want.contains).mkString(", ")} new; " +
          s"${want.filterNot(gotCols.contains).mkString(", ")} gone) — " +
          "restart the query from its checkpoint to adopt the new " +
          "schema; this batch redelivers after restart, nothing is lost")
    val cols = schema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col)
    val out = d.select(cols: _*)
    // TYPE evolution (ALTER COLUMN TYPE widening) changes no name, so
    // the set check above cannot see it — but serving a LONG batch
    // under a frozen INT schema corrupts or crashes downstream.
    // Same fail-with-fix contract: restart re-resolves the wide type.
    val retyped = schema.fields.zip(out.schema.fields).collect {
      case (w, g) if w.dataType != g.dataType =>
        s"${w.name}: ${w.dataType.simpleString} -> ${g.dataType.simpleString}"
    }
    if (retyped.nonEmpty)
      throw new SchemaEvolvedException(
        s"graft-cdc: column type(s) of $path${table.map("/" + _)
          .getOrElse("")} changed under the running stream " +
          s"(${retyped.mkString("; ")}) — restart the query from its " +
          "checkpoint to adopt the new types; this batch redelivers " +
          "after restart, nothing is lost")
    GraftShim.streamingDataFrame(spark, out)
  }

  override def stop(): Unit = ()
}
