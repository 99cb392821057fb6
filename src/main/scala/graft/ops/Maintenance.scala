package graft.ops

import org.apache.spark.sql.SparkSession

/** One-call table maintenance — the OPTIMIZE/VACUUM policy loop a
  * production table runs on a schedule, composed from the primitives
  * in dependency order:
  *
  *   1. [[Compact.recover]] — finish any crashed predecessor first;
  *   2. [[DeletionVectors.materializeWhere]] — fold vectors past the
  *      tombstone threshold (frees their files for packing);
  *   3. [[Compact.binPack]] — pack the small tail (skips whatever
  *      still carries a vector), optionally reclustering it;
  *   4. [[TxLog.checkpoint]] — bound snapshot planning to the tail;
  *   5. [[TxLog.vacuum]] / [[TxLog.vacuumOlderThan]] — reclaim
  *      superseded data files, dead sidecars and the pruned log.
  *
  * Every step is idempotent and crash-safe on its own, so the loop
  * can die anywhere and simply run again. Single-maintenance-writer
  * assumption, like each primitive. Plain (non-log) directories get
  * the subset that applies (recover + pack).
  */
object Maintenance {

  final case class Receipt(
      foldedFiles: Long,
      packedFiles: Long,
      filesReclaimed: Long,
      checkpointedAt: Int,
      localizedFiles: Long = 0)

  /** `localizeClones = true` adds the clone-detach step: a shallow
    * clone's still-based entries copy local ([[TxLog.localize]])
    * BEFORE the pack, so the freshly-copied files join the same
    * maintenance pass — the knob a clone owner flips when the source
    * is scheduled to retire. Default off: shared bytes are the point
    * of a clone.
    */
  def run(
      spark: SparkSession,
      dir: String,
      dvFoldFraction: Double = 0.2,
      targetBytes: Long = 128L << 20,
      smallBytes: Long = 32L << 20,
      sortCols: Seq[String] = Nil,
      zorderCols: Seq[String] = Nil,
      retainVersions: Int = -1,
      retainMs: Long = -1L,
      localizeClones: Boolean = false): Receipt = {
    require(retainVersions < 0 || retainMs < 0,
      "pick ONE retention axis: retainVersions or retainMs")
    Compact.recover(spark, dir)
    val logged = TxLog.exists(spark, dir)
    val localized =
      if (!logged || !localizeClones) 0L
      else TxLog.localize(spark, dir, targetBytes).localized
    val folded =
      if (!logged) 0L
      else DeletionVectors.materializeWhere(spark, dir, dvFoldFraction)
        .rewritten
    val packed = Compact.binPack(spark, dir, targetBytes, smallBytes,
      sortCols, zorderCols).packed
    val cp = if (logged) TxLog.checkpoint(spark, dir) else -1
    val reclaimed =
      if (!logged) 0L
      else if (retainMs >= 0)
        TxLog.vacuumOlderThan(spark, dir, retainMs)
      else if (retainVersions >= 0)
        TxLog.vacuum(spark, dir, retainVersions)
      else 0L
    Receipt(folded, packed, reclaimed, cp, localized)
  }
}
