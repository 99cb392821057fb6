package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** IDENTITY COLUMNS — `GENERATED ALWAYS AS IDENTITY`, log-carried:
  * the table declares one BIGINT column the engine fills on insert
  * with unique, monotonically-allocated values (Delta/SQL-standard
  * identity semantics: uniqueness and monotonic allocation are
  * guaranteed, density is NOT — a failed write burns its range, and
  * concurrent writers hold disjoint ranges).
  *
  * Two pieces, both metadata-sized:
  *
  *   - the DECLARATION (`identity.txt` in the log dir): column name,
  *     start, step. Written by [[declare]] or `CREATE TABLE … BIGINT
  *     GENERATED ALWAYS AS IDENTITY` ([[graft.plans.GraftDdl]]).
  *   - the ALLOCATION LEDGER (`idhw.NNNNNNNN.txt` claim files): each
  *     assigning write CLAIMS the next ledger number with the same
  *     kernel-atomic no-overwrite primitive the version files use
  *     ([[TxLog]]'s link(2)/FileContext discipline), carrying the new
  *     high water. Two racing appends therefore allocate DISJOINT id
  *     ranges before either commits — no id collision under any
  *     interleaving, and a crash between allocation and commit leaves
  *     only a gap (the documented identity trade every database
  *     makes). The ledger is independent of commit order.
  *
  * ASSIGNMENT is shuffle-free: the batch is pinned
  * (`localCheckpoint`), per-partition row counts are collected (one
  * count per partition — metadata, not rows), cumulative offsets are
  * broadcast back, and each row's id is `first + step * (offset(pid)
  * + localIndex)` computed from `monotonically_increasing_id()`'s
  * partition-local counter — no window over a single partition, no
  * global sort, no RDD round trip. 100 TB shape: one extra count job
  * over the BATCH (never the table) plus one tiny claim file per
  * write.
  *
  * GENERATED ALWAYS: a batch that already carries the column refuses
  * — explicit inserts would silently break the uniqueness claim
  * (re-declare with [[declare]] if you really need to reseed; the
  * ledger keeps values monotone past any reseed).
  *
  * Reference anchor: the reference's dimension ids are pandas
  * `range(len(df))` + max-probe re-bases (`dags/emission-dag.py:
  * 104-110`) — exactly the driver-side id assignment that cannot
  * survive two concurrent writers; this is the log-arbitrated form.
  */
object IdentityColumns {

  private val DeclName = "identity.txt"
  private val LedgerPrefix = "idhw."

  /** Declare `column` as the table's identity column (BIGINT,
    * GENERATED ALWAYS). One identity column per table. Idempotent
    * for the same declaration; re-declaring changes start/step for
    * FUTURE allocations only (the ledger keeps monotonicity).
    */
  def declare(
      spark: SparkSession,
      dir: String,
      column: String,
      start: Long = 1L,
      step: Long = 1L): Unit = {
    require(step != 0L, "identity: step must be non-zero")
    TxLog.tableSchema(spark, dir).foreach { pin =>
      pin.fields.find(_.name == column).foreach { f =>
        require(f.dataType == org.apache.spark.sql.types.LongType,
          s"identity column $column must be BIGINT, is ${f.dataType}")
      }
    }
    TxLog.metaWrite(spark, dir, DeclName, s"$column\t$start\t$step")
  }

  /** The declared (column, start, step), if any. */
  def spec(spark: SparkSession, dir: String): Option[(String, Long, Long)] =
    TxLog.metaRead(spark, dir, DeclName).map { body =>
      val Array(c, st, sp) = body.trim.split('\t')
      (c, st.toLong, sp.toLong)
    }

  private def ledgerFiles(spark: SparkSession, dir: String): Seq[(Int, String)] =
    TxLog.metaList(spark, dir, LedgerPrefix)
      .filter(_.matches("idhw\\.\\d{8}\\.txt"))
      .map(n => n.substring(5, 13).toInt -> n)
      .sortBy(_._1)

  /** The last allocated value (`start - step` before any allocation —
    * so the first value handed out is exactly `start`).
    */
  def highWater(spark: SparkSession, dir: String): Long = {
    val (_, start, step) = spec(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir declares no identity column"))
    ledgerFiles(spark, dir).lastOption
      .flatMap { case (_, n) => TxLog.metaRead(spark, dir, n) }
      .map(_.trim.toLong)
      .getOrElse(start - step)
  }

  /** Claim `n` ids: atomically append a ledger entry moving the high
    * water by `n * step`; returns the FIRST allocated value. The claim
    * loop retries past racing allocators (each retry re-reads the
    * water), so concurrent writers get disjoint ranges.
    */
  def allocate(spark: SparkSession, dir: String, n: Long): Long = {
    require(n > 0, s"identity allocate: n must be positive, got $n")
    val (_, _, step) = spec(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir declares no identity column"))
    val fs = Compact.fsOf(spark, dir)
    val logDir = new Path(dir, "_txlog")
    var tries = 0
    while (true) {
      tries += 1
      require(tries <= 100, s"identity allocate: 100 contended claims in $dir")
      val seq = ledgerFiles(spark, dir).lastOption.map(_._1 + 1).getOrElse(0)
      val hw = highWater(spark, dir)
      val newHw = hw + n * step
      val dest = new Path(logDir, f"$LedgerPrefix$seq%08d.txt")
      val tmp = new Path(logDir, s".${dest.getName}.${java.util.UUID.randomUUID}.tmp")
      val out = fs.create(tmp, true)
      try out.write(newHw.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (TxLog.atomicClaim(fs, tmp, dest)) return hw + step
      // lost the race: loop re-reads the ledger and claims the next slot
    }
    -1L // unreachable
  }

  /** Fill the identity column on a batch that lacks it; refuse a batch
    * that carries it (GENERATED ALWAYS). Identity on the frame the
    * table's append paths stage — [[TxLog.append]],
    * [[TxLog.overwriteAll]] and the streaming append sink all route
    * through here, so every insert surface agrees.
    */
  private[graft] def maybeAssign(
      spark: SparkSession, dir: String, df: DataFrame): DataFrame =
    spec(spark, dir) match {
      case None => df
      case Some((column, _, step)) =>
        if (df.columns.contains(column)) {
          // a zero-row frame carrying the column is a TRUNCATE /
          // empty-overwrite, not an explicit insert — let it through
          require(df.isEmpty,
            s"identity column $column is GENERATED ALWAYS — the insert " +
              "must not supply it (drop the column from the batch; " +
              "re-declare to reseed)")
          return df
        }
        // pin the batch so partition contents and local order cannot
        // shift between the count pass and the assignment pass
        val pinned = df.localCheckpoint()
        val withPid = pinned
          .withColumn("__graft_idpid", spark_partition_id().cast("long"))
          .withColumn("__graft_idmid", monotonically_increasing_id())
        // one row per PARTITION — metadata-sized collect
        val counts = withPid.groupBy("__graft_idpid").count()
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val total = counts.map(_._2).sum
        if (total == 0)
          return pinned.withColumn(column, lit(null).cast("long"))
        val first = allocate(spark, dir, total)
        val offsets = counts.map(_._1)
          .zip(counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
        import spark.implicits._
        val offDf = offsets.toSeq.toDF("__graft_idpid", "__graft_idoff")
        // monotonically_increasing_id = (pid << 33) | local index —
        // subtracting the partition base yields the dense local index
        // without any window or sort
        withPid.join(broadcast(offDf), Seq("__graft_idpid"))
          .withColumn(column,
            lit(first) + (col("__graft_idoff") +
              (col("__graft_idmid") - shiftleft(col("__graft_idpid"), 33))) *
              lit(step))
          .drop("__graft_idpid", "__graft_idmid", "__graft_idoff")
    }

  /** Drop superseded ledger entries (all but the newest) — called from
    * [[TxLog.vacuum]]'s log prune; only the newest is ever read, and
    * an in-flight allocator claims strictly above the newest.
    */
  private[ops] def pruneLedger(spark: SparkSession, dir: String): Unit = {
    val fs = Compact.fsOf(spark, dir)
    val files = ledgerFiles(spark, dir)
    files.dropRight(1).foreach { case (_, n) =>
      fs.delete(new Path(new Path(dir, "_txlog"), n), false)
    }
  }
}
