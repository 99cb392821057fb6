package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** A tiny monotone LEDGER in the transaction-log directory: numbered
  * claim files (`<prefix>NNNNNNNN.txt`), each carrying one long — the
  * high water after that claim. Claims land with the same
  * kernel-atomic no-overwrite primitive the version files use
  * ([[TxLog.atomicClaim]]'s link(2)/FileContext discipline), so racing
  * claimants serialize BEFORE committing anything data-sized: each
  * retry re-reads the water and claims the next slot, and a crash
  * between claim and commit burns a gap, never a collision. The ledger
  * is independent of commit order and metadata-sized throughout.
  *
  * Two users: the identity-column allocation ledger
  * ([[IdentityColumns]], prefix `idhw.`) and the row-tracking base-id
  * ledger ([[RowTracking]], prefix `rowhw.`).
  */
private[ops] object MetaLedger {

  private def ledgerFiles(
      spark: SparkSession, dir: String, prefix: String): Seq[(Int, String)] =
    TxLog.metaList(spark, dir, prefix)
      .filter(_.matches(
        java.util.regex.Pattern.quote(prefix) + "\\d{8}\\.txt"))
      .map(n => n.substring(prefix.length, prefix.length + 8).toInt -> n)
      .sortBy(_._1)

  /** The last claimed value (`default` before any claim). 'No ledger
    * yet' and 'the listed newest entry vanished under us' are NOT the
    * same case: the latter means a newer entry landed and a racing
    * vacuum pruned the one we listed between the listing and the read
    * — falling back to `default` there would silently reset the water
    * and re-issue already-allocated ranges, so we re-list and retry.
    */
  def highWater(
      spark: SparkSession, dir: String, prefix: String,
      default: Long): Long = {
    var tries = 0
    while (tries < 20) {
      tries += 1
      ledgerFiles(spark, dir, prefix).lastOption match {
        case None => return default
        case Some((_, n)) =>
          TxLog.metaRead(spark, dir, n) match {
            case Some(body) => return body.trim.toLong
            case None => () // raced a prune: re-list
          }
      }
    }
    throw new IllegalStateException(
      s"ledger $prefix: 20 list/read races in $dir")
  }

  /** Atomically land a ledger entry whose value is `move(current high
    * water)`. Each retry re-reads the water, so racing writers
    * serialize on the kernel-atomic claim and every landed entry
    * reflects the water it was computed from. `move` returning the
    * water unchanged claims nothing. Returns (old water, new water).
    */
  def claim(
      spark: SparkSession, dir: String, prefix: String,
      default: Long, move: Long => Long): (Long, Long) = {
    val fs = Compact.fsOf(spark, dir)
    val logDir = new Path(dir, "_txlog")
    var tries = 0
    while (true) {
      tries += 1
      require(tries <= 100, s"ledger $prefix: 100 contended claims in $dir")
      val seq =
        ledgerFiles(spark, dir, prefix).lastOption.map(_._1 + 1).getOrElse(0)
      val hw = highWater(spark, dir, prefix, default)
      val newHw = move(hw)
      if (newHw == hw) return (hw, hw) // nothing to move — no entry
      val dest = new Path(logDir, f"$prefix$seq%08d.txt")
      val tmp =
        new Path(logDir, s".${dest.getName}.${java.util.UUID.randomUUID}.tmp")
      val out = fs.create(tmp, true)
      try out.write(newHw.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (TxLog.atomicClaim(fs, tmp, dest)) return (hw, newHw)
      // lost the race: loop re-reads the ledger and claims the next slot
    }
    (0L, 0L) // unreachable
  }

  /** Drop superseded entries (all but the newest) — the vacuum hook;
    * only the newest is ever read, and an in-flight claimant claims
    * strictly above it.
    */
  def prune(spark: SparkSession, dir: String, prefix: String): Unit = {
    val fs = Compact.fsOf(spark, dir)
    ledgerFiles(spark, dir, prefix).dropRight(1).foreach { case (_, n) =>
      fs.delete(new Path(new Path(dir, "_txlog"), n), false)
    }
  }
}
