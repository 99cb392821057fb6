package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, GraftShim, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** `writeStream.format("graft")` — the transaction-log sink family as
  * a first-class streaming format, so an exactly-once log-landing
  * pipeline needs no `foreachBatch` code at all:
  *
  * {{{
  * df.writeStream.format("graft")
  *   .option("path", dir)                    // TxLog table root
  *   .option("mode", "append")               // append (default) |
  *                                           //   merge | apply | route
  *   .option("keys", "k1,k2")                // merge: MERGE keys
  *   .option("sequenceBy", "seq")            // merge: CDC netting col
  *   .option("tableCol", "t")                // route: discriminator
  *   .option("compactEvery", "16")           // epochs between binPacks
  *   .option("materializeEvery", "8")        // merge: DV fold cadence
  *   .option("followDrops", "true")          // apply: replica follows
  *                                           //   source DROP COLUMNs
  *   .option("branch", "staging")            // land epochs on a branch
  *   .option("checkpointLocation", cp)
  *   .start()
  * }}}
  *
  * `branch` lands every epoch on an EXISTING branch
  * ([[graft.ops.TxLog.createBranch]]) instead of main — the streaming
  * write-audit-publish shape: the stream stages into the branch,
  * an audit reads it, [[graft.ops.TxLog.publishBranch]] flips main
  * atomically. The scope must open inside `addBatch` because branch
  * scoping is thread-local and microbatches run on the stream
  * execution thread. Stop the stream before publishing: the publish
  * consumes the branch (and its epoch stamps), so a stream restarted
  * across a publish would replay its last epoch into a fresh branch.
  *
  * V1 streaming Sink (the Delta-sink pattern — same package for the
  * same `private[sql]` access) delegating each microbatch to the
  * proven `foreachBatch` members: `append` →
  * [[graft.streaming.TxLogIngest.appendSink]] (staged files, one
  * epoch-stamped commit), `merge` →
  * [[graft.streaming.TxLogIngest.mergeSink]] (SEQUENCE-BY netting +
  * merge-on-read upsert — O(batch) write bytes per epoch), `apply` →
  * [[graft.ops.UpsertWhere.applyChanges]] (CDC application incl.
  * deletes — the `graft-cdc` feed's own column contract), `route` →
  * [[graft.streaming.DbIngest.routeSink]] (multi-table fan-out by
  * discriminator, one cross-table atomic commit per epoch).
  * Exactly-once is the delegates' own `TxLog.txnCommitted` probe on
  * the epoch id — a replayed batch whose commit landed is a no-op —
  * so this sink composes with `format("graft-cdc")` into end-to-end
  * log-to-log replication written entirely in standard Spark APIs.
  *
  * 100 TB shape: per-epoch cost is O(batch) files staged + one commit
  * (metadata-sized); inline maintenance (`compactEvery` /
  * `materializeEvery`) amortizes small-file and tombstone debt on the
  * sink's own cadence instead of a separate job.
  */
final class GraftSinkProvider
    extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft sink: partitionBy is not supported — hive layout comes " +
        "from the table itself (TxLog.append respects it)")
    new GraftSink(parameters)
  }
}

final class GraftSink(parameters: Map[String, String]) extends Sink {

  private val path = parameters.getOrElse("path",
    throw new IllegalArgumentException("graft sink requires option 'path'"))
  private val mode = parameters.getOrElse("mode", "append").toLowerCase
  private def intOpt(name: String, default: Int): Int =
    parameters.get(name).map(_.toInt).getOrElse(default)
  private val compactEvery = intOpt("compactEvery", 0)
  private val compactTargetBytes =
    parameters.get("compactTargetBytes").map(_.toLong).getOrElse(128L << 20)

  private val epochFn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
    mode match {
      case "append" =>
        graft.streaming.TxLogIngest.appendSink(
          path, compactEvery, compactTargetBytes)
      case "merge" =>
        val keys = parameters.getOrElse("keys", throw new IllegalArgumentException(
          "graft sink mode=merge requires option 'keys' (comma-separated)"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        graft.streaming.TxLogIngest.mergeSink(
          path, keys,
          seqCol = parameters.get("sequenceBy"),
          materializeEvery = intOpt("materializeEvery", 0),
          evolveSchema = parameters.get("evolveSchema").exists(_.toBoolean),
          compactEvery = compactEvery,
          compactTargetBytes = compactTargetBytes)
      case "apply" =>
        // CDC application: the batch carries _change_type /
        // _commit_version (exactly what format("graft-cdc") emits) and
        // lands through [[graft.ops.UpsertWhere.applyChanges]] —
        // idempotent by construction (a feed's net effect is keyed
        // state), so a replayed epoch needs no stamp. graft-cdc →
        // graft/apply is end-to-end log replication in pure Spark API.
        val key = parameters.getOrElse("keys", throw new IllegalArgumentException(
          "graft sink mode=apply requires option 'keys' (the key column)"))
        require(!key.contains(","),
          "graft sink mode=apply: applyChanges keys on ONE column")
        (batch, _) => {
          val spark = batch.sparkSession
          if (!graft.ops.TxLog.exists(spark, path))
            graft.ops.TxLog.convert(spark, path)
          val renamed = batch.toDF()
            .withColumnsRenamed(Map(
              "_change_type" -> "change_type",
              "_commit_version" -> "commit_version"))
          // followDrops=true opts the replica into following source
          // DROP COLUMNs (otherwise a mid-stream drop wedges every
          // redelivery after the supervisor's restart). OPT-IN, never
          // forced: under the default a feed that merely PROJECTS a
          // subset still fails loudly instead of silently destroying
          // replica columns.
          graft.ops.UpsertWhere.applyChanges(spark, path, key, renamed,
            followDrops =
              parameters.get("followDrops").exists(_.toBoolean),
            // a micro-batch is churn-sized by construction: pin it
            // once instead of re-running the source plan per action
            materializeFeed = true)
          ()
        }
      case "route" =>
        val tcol = parameters.getOrElse("tableCol",
          throw new IllegalArgumentException(
            "graft sink mode=route requires option 'tableCol'"))
        graft.streaming.DbIngest.routeSink(
          path, tcol, compactEvery, compactTargetBytes)
      case other => throw new IllegalArgumentException(
        s"graft sink: unknown mode '$other' (append | merge | route)")
    }

  private val branch = parameters.get("branch")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    def run(): Unit = epochFn(GraftShim.batchDataFrame(data), batchId)
    branch match {
      case Some(b) =>
        graft.ops.TxLog.withBranch(data.sparkSession, path, b)(run())
      case None => run()
    }
  }

  override def toString: String = s"GraftSink[$mode -> $path]"
}
