package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Row}

import graft.ops.{Compact, DbLog, TxLog}

/** Streaming fan-out into a [[DbLog]] database: each micro-batch's
  * rows ROUTE to per-type tables by a discriminator column, and the
  * whole epoch — however many tables it touches — lands as ONE
  * atomic, epoch-stamped commit. This is the multi-table twin of
  * [[TxLogIngest.appendSink]], and the property it adds is
  * exactly-once ACROSS tables: a replayed epoch is either fully
  * present in every routed table or in none, because there is only
  * one commit to probe ([[TxLog.txnCommitted]]) and only one version
  * file to land. Per-table sinks can't say that — a crash between
  * two tables' commits leaves the split visible.
  *
  * Routing cost is ONE pass over the batch: the stage write
  * `partitionBy`s the discriminator, so Spark's own partitioned
  * write does the split (no per-table filter rescan), and the
  * partition directories then move under their tables. The
  * discriminator column itself is consumed by the routing (it lives
  * in the table NAME, exactly like a hive partition column in its
  * directory name) — readers that need it re-attach a literal.
  *
  * Discriminator values must be legal table names
  * (`[A-Za-z_][A-Za-z0-9_]*`) and non-NULL — anything else fails the
  * epoch loudly rather than minting junk tables.
  *
  * `compactEvery` > 0 bin-packs every table's small-file tail (one
  * prefix-confined pack per table — other tables' entries ride
  * through untouched) and checkpoints the log after every that-many
  * epochs — the same inline maintenance the single-table sinks run.
  */
object DbIngest {

  private val TableName = "[A-Za-z_][A-Za-z0-9_]*".r

  def routeSink(
      db: String,
      tableCol: String,
      compactEvery: Int = 0,
      compactTargetBytes: Long = 128L << 20):
      (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], epoch: Long) => {
      val spark = batch.sparkSession
      if (!DbLog.exists(spark, db)) DbLog.create(spark, db)
      val txn = s"epoch_$epoch"
      if (!TxLog.txnCommitted(spark, db, txn)) {
        TxLog.enforceConstraints(spark, db, batch.toDF())
        val fs = new Path(db)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val stage = new Path(db, ".route_stage")
        fs.delete(stage, true)
        batch.write.partitionBy(tableCol)
          .mode("overwrite").parquet(stage.toString)
        val routed = fs.listStatus(stage).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.contains('='))
          .map { s =>
            val value = s.getPath.getName.split("=", 2)(1)
            require(value != "__HIVE_DEFAULT_PARTITION__",
              s"routeSink: NULL $tableCol in epoch $epoch — " +
                "every row must name its destination table")
            require(TableName.pattern.matcher(value).matches(),
              s"routeSink: '$value' is not a legal table name " +
                s"(epoch $epoch routed on $tableCol)")
            (value, s.getPath)
          }
        val adds = routed.flatMap { case (table, pdir) =>
          fs.mkdirs(new Path(db, table))
          fs.listStatus(pdir).toSeq
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
            .map(_.getPath.getName).sorted
            .map { n =>
              if (!fs.rename(new Path(pdir, n), new Path(db, s"$table/$n")))
                throw new java.io.IOException(
                  s"routeSink: cannot move $table/$n into $db")
              s"$table/$n"
            }
        }
        fs.delete(stage, true)
        TxLog.commit(spark, db, adds = adds, removes = Nil, txn = Some(txn),
          op = Some(s"stream-route($tableCol)"))
      }
      if (compactEvery > 0 && (epoch + 1) % compactEvery == 0) {
        // binPack on a prefixed table auto-iterates per prefix — one
        // prefix-confined pack per table, never across tables
        Compact.binPack(spark, db, targetBytes = compactTargetBytes,
          smallBytes = compactTargetBytes / 4)
        TxLog.checkpoint(spark, db)
      }
      ()
    }
}
