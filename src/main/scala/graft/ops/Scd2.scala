package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.TableStore
import graft.similarity.IndexStore

/** Type-2 slowly-changing-dimension history — the warehouse answer to
  * "keep every version of a dimension row, with validity intervals",
  * maintained incrementally from snapshot batches. The reference's
  * ETL upserts dimensions in place (type 1 — `dags/emission-dag.py`'s
  * new-rows-only appends); SCD2 is the standard extension a warehouse
  * grows into when history starts to matter (who WAS this customer
  * when the order shipped?).
  *
  * Storage splits along the mutation boundary, because parquet does
  * not update in place:
  *  - `<name>__current` — exactly one row per key (cell = key-hash
  *    shard, keys…, attrs…, valid_from). The ONLY table a merge
  *    rewrites, and only its touched shards.
  *  - `<name>__closed` — superseded versions, APPEND-ONLY (cell, id =
  *    key|valid_to, keys…, attrs…, valid_from, valid_to). History
  *    never rewrites: at 100 TB the accumulated past is the big side,
  *    and it only ever receives the delta.
  *
  * Versions are caller-supplied monotone longs (batch epochs), not
  * wall clock — deterministic, replayable, oracle-checkable.
  *
  * Merge semantics per snapshot row: new key → insert current;
  * changed attrs (null-safe comparison) → close the old version into
  * `__closed` (valid_to = version) and replace current (valid_from =
  * version); unchanged → untouched. Keys absent from the snapshot
  * stay current (dimension feeds are upserts; a delete feed would be
  * a separate close operation).
  *
  * Crash/replay contract: the closed-row append goes FIRST and is
  * idempotent per (key, valid_to) through the shard-pruned ingest
  * kernel ([[IndexStore.appendNewById]] — same discipline as every
  * state table here), then the current-shard rewrite publishes
  * atomically per shard. A crash in between replays cleanly: the
  * closed rows are recognized (no-op), the rewrite re-derives the
  * same content from the unchanged current + snapshot. A full replay
  * after publish detects zero changes and touches nothing.
  */
object Scd2 {

  private def currentTable(name: String) = s"${name}__current"
  private def closedTable(name: String) = s"${name}__closed"
  private def metaTable(name: String) = s"${name}__scd_meta"

  private def cellOf(keyCols: Seq[String], nShards: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(nShards.toLong)).cast("int")

  case class MergeStats(inserted: Long, changed: Long, unchanged: Long)

  /** Byte-denominated broadcast gate (r8 verdict: the former 1M-ROW
    * cutoffs mis-gate wide dimensions — 1M rows × a 500-byte schema is
    * half a GB on the build side). Estimate = known row count × the
    * schema's per-row default size, against a conservative 64 MiB
    * executor-memory bound — the same denomination as Spark's own
    * autoBroadcastJoinThreshold, sized for a build-side hash table.
    */
  private val maxBroadcastBytes: Long = 64L << 20
  private def broadcastable(df: DataFrame, rows: Long): Boolean =
    rows * df.schema.defaultSize <= maxBroadcastBytes

  private def readShards(store: TableStore, name: String): Int = {
    val mt = metaTable(name)
    require(store.exists(mt), s"scd2 '$name' not initialized")
    store.read(mt).head().getInt(0)
  }

  def exists(store: TableStore, name: String): Boolean =
    store.exists(metaTable(name))

  /** The classification join, exposed for plan tests: every snapshot
    * key against the pruned current side. Spark builds the RIGHT side
    * of a LeftOuter join, so `broadcastCur` hints the pruned current
    * side — then it plans a BroadcastHashJoin and neither side
    * shuffles (the r8 right-outer + broadcast(feed) variant was
    * silently unplannable and fell back to a shuffle).
    */
  private[graft] def classifyJoin(
      snapRenamed: DataFrame,
      curSide: DataFrame,
      keyCols: Seq[String],
      broadcastCur: Boolean): DataFrame =
    if (broadcastCur) snapRenamed.join(broadcast(curSide), keyCols, "left")
    else snapRenamed.join(curSide, keyCols, "left")

  /** Fold one snapshot batch into the history at `version`. Returns
    * how the snapshot classified. Only the snapshot's own key shards
    * are read from `__current` (partition-pruned) and only shards
    * holding a new or changed key rewrite.
    */
  /** Fold one snapshot batch into the history at `version`.
    * `nShards = 0` (first merge only) sizes the shard map to the
    * snapshot — one shard per ~16k keys, power of two, capped at
    * 4096. The divisor IS the scattered-delta write amplification
    * (~keysPerShard current rows rewrite per changed key), so finer
    * helps deltas — but every shard is also a file set, and the
    * round-8 probe measured per-file overhead overtaking row volume
    * below ~16k keys/shard on this storage (512 shards priced a 1.5M
    * init at 35 s vs 13 s at 128). 16k/shard is the measured balance;
    * pass `nShards` explicitly for a known-delta-heavy dimension.
    */
  def merge(
      store: TableStore,
      name: String,
      snapshot: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      version: Long,
      nShards: Int = 0): MergeStats = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val spark = snapshot.sparkSession
    import spark.implicits._
    val cur = currentTable(name)
    val cols = keyCols ++ attrCols

    if (!store.exists(metaTable(name))) {
      // first snapshot: everything becomes current in one shot
      val n = snapshot.count()
      val shards0 =
        if (nShards > 0) nShards
        else math.min(4096L, java.lang.Long.highestOneBit(
          math.max(1L, (n + (1L << 14) - 1) / (1L << 14)) * 2 - 1)).toInt
      val init = snapshot.select(cols.map(col): _*)
        .withColumn("cell", cellOf(keyCols, shards0))
        .withColumn("valid_from", lit(version))
      store.overwritePartitioned(init, cur, "cell")
      store.overwrite(Seq(shards0).toDF("n_shards"), metaTable(name))
      return MergeStats(inserted = n, changed = 0, unchanged = 0)
    }

    val shards = readShards(store, name)
    val snap = snapshot.select(cols.map(col): _*)
      .withColumn("cell", cellOf(keyCols, shards))
      .localCheckpoint() // pinned: classification + rewrite both read it
    val touched = snap.select(col("cell").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val stored = store.read(cur)
      .filter(col("cell").cast("string").isin(touched: _*))

    // classify: join current on keys; null-safe attr comparison.
    // Spark only builds the RIGHT side of a LeftOuter join (and the
    // LEFT of a RightOuter) — so the broadcastable side here must be
    // the pruned CURRENT shards, not the feed. A delta feed touches
    // few cells, bounding the pruned current side (touched cells ×
    // ~16k keys/cell); it broadcasts and NEITHER side shuffles. A
    // full-snapshot feed (every cell touched) takes the plain
    // shuffle join.
    val total = snap.count()
    val changedPred = attrCols
      .map(a => !(col(s"__new_$a") <=> col(a)))
      .reduce(_ || _)
    val snapRenamed = attrCols.foldLeft(snap)((df, a) =>
      df.withColumnRenamed(a, s"__new_$a"))
    val curSide = stored.withColumnRenamed("cell", "__cur_cell")
    // byte-gated like every other broadcast here: pruned current ≈
    // touched cells × the ~16k keys/cell the shard sizing targets ×
    // the row width — not a bare cell count
    val joined = classifyJoin(snapRenamed, curSide, keyCols,
      broadcastCur = broadcastable(curSide, touched.size.toLong << 14))
      .withColumn("__class",
        when(col("valid_from").isNull, lit("new"))
          .when(changedPred, lit("changed"))
          .otherwise(lit("same")))
    // pin ONLY the delta — "same" rows are never consumed downstream,
    // and a full-snapshot feed is mostly "same": checkpointing the
    // whole classification materialized 1.5M rows to hand 40 onward
    // in the round-8 scale probe. The delta checkpoint also cuts the
    // lineage into the table the rewrite below mutates.
    val deltaRows = joined.filter(col("__class") =!= "same").localCheckpoint()
    val byClass = deltaRows.groupBy("__class").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = MergeStats(
      byClass.getOrElse("new", 0L), byClass.getOrElse("changed", 0L),
      total - byClass.values.sum)

    if (stats.inserted + stats.changed > 0) {
      // closed rows FIRST, idempotent per (key, valid_to): a replay
      // after a crash between the two writes re-recognizes them
      val keyExpr = concat_ws("|", (keyCols.map(col) :+ lit(version)): _*)
      val closedRows = deltaRows.filter(col("__class") === "changed")
        .select((keyCols.map(col) ++ attrCols.map(col) :+
          col("valid_from") :+ col("__cur_cell").as("cell")): _*)
        .withColumn("valid_to", lit(version))
        .withColumn("id", keyExpr)
      // only when something actually CLOSED: an insert-only merge used
      // to create the table with zero rows here — a directory with no
      // parquet footers that exists() affirms and read() then fails to
      // infer a schema from (found by the MV min/max lifecycle)
      if (stats.changed > 0) {
        val ct = closedTable(name)
        if (!store.exists(ct)) store.overwritePartitioned(closedRows, ct, "cell")
        else IndexStore.appendNewById(store, ct, closedRows)
      }

      // rewrite ONLY the shards holding a new or changed key — NOT
      // every shard the snapshot touches. The distinction is the whole
      // cost model for the standard full-snapshot upsert feed: the
      // snapshot covers all shards every time (classification must
      // read them — a column-pruned READ), but the WRITE surface is
      // the delta's shards. The replaced-key side is the (bounded)
      // delta, so it broadcasts when small — the corpus survivors
      // never shuffle.
      val changedCells = deltaRows
        .select(col("cell").cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
      val replacedRaw = deltaRows.select(keyCols.map(col): _*)
      val replacedKeys =
        if (broadcastable(replacedRaw, stats.inserted + stats.changed))
          broadcast(replacedRaw)
        else replacedRaw
      val survivors = store.read(cur)
        .filter(col("cell").cast("string").isin(changedCells: _*))
        .join(replacedKeys, keyCols, "left_anti")
      val fresh = deltaRows
        .select((keyCols.map(col) ++
          attrCols.map(a => col(s"__new_$a").as(a)) :+ col("cell")): _*)
        .withColumn("valid_from", lit(version))
      store.rewritePartitioned(
        survivors.unionByName(fresh), cur, "cell", changedCells)
    }
    stats
  }

  /** The delete feed: retire `keys` at `version` — close their
    * current rows (valid_to = version) and remove them from the live
    * dimension, so [[current]] no longer returns them while [[asOf]]
    * any earlier version still does. Returns how many keys actually
    * closed.
    *
    * Same cost model as [[merge]]'s delta path: the feed's key shards
    * are the only current partitions read, the closed append is
    * idempotent per (key, valid_to) — a replay, or a retire of an
    * already-absent key, is a no-op — and only shards that actually
    * held a victim rewrite. A key re-introduced by a later merge
    * starts a fresh interval (SCD2 resurrection): the old interval
    * stays closed, the new one opens at the merge's version.
    */
  def retire(
      store: TableStore,
      name: String,
      keys: DataFrame,
      keyCols: Seq[String],
      version: Long): Long = {
    require(keyCols.nonEmpty)
    if (!store.exists(metaTable(name))) return 0L
    val shards = readShards(store, name)
    val keyed = keys.select(keyCols.map(col): _*).distinct()
      .withColumn("cell", cellOf(keyCols, shards))
      .localCheckpoint() // pinned: cells probe + semi join both read it
    val touched = keyed.select(col("cell").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (touched.isEmpty) return 0L
    val cur = currentTable(name)
    val nKeys = keyed.count()
    val feed = keyed.drop("cell")
    // victims pinned: the closed append and the survivor rewrite both
    // read the table this call mutates
    val victims = store.read(cur)
      .filter(col("cell").cast("string").isin(touched: _*))
      .join(if (broadcastable(feed, nKeys)) broadcast(feed) else feed,
        keyCols, "semi")
      .localCheckpoint()
    val nClosed = victims.count()
    if (nClosed == 0) return 0L
    val keyExpr = concat_ws("|", (keyCols.map(col) :+ lit(version)): _*)
    // same column order as merge's closed rows — appends line up
    val attrCols = victims.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == "cell" || c == "valid_from")
    val closedRows = victims
      .select((keyCols.map(col) ++ attrCols.map(col) :+
        col("valid_from") :+ col("cell")): _*)
      .withColumn("valid_to", lit(version))
      .withColumn("id", keyExpr)
    val ct = closedTable(name)
    if (!store.exists(ct)) store.overwritePartitioned(closedRows, ct, "cell")
    else IndexStore.appendNewById(store, ct, closedRows)
    val victimCells = victims.select(col("cell").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val victimKeys = victims.select(keyCols.map(col): _*)
    val survivors = store.read(cur)
      .filter(col("cell").cast("string").isin(victimCells: _*))
      .join(if (broadcastable(victimKeys, nClosed)) broadcast(victimKeys)
        else victimKeys, keyCols, "left_anti")
    store.rewritePartitioned(survivors, cur, "cell", victimCells)
    nClosed
  }

  /** The live dimension: one row per key, as of the latest merge. */
  def current(store: TableStore, name: String): DataFrame =
    store.read(currentTable(name)).drop("cell")

  /** Full type-2 view: every version with its validity interval —
    * current rows carry valid_to NULL and is_current true.
    */
  def history(store: TableStore, name: String): DataFrame = {
    val cur = store.read(currentTable(name)).drop("cell")
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    if (!store.exists(closedTable(name))) cur
    else cur.unionByName(
      store.read(closedTable(name)).drop("cell", "id")
        .withColumn("is_current", lit(false)))
  }

  /** Time travel: the dimension exactly as it stood at `version`
    * (rows whose interval covers it — closed rows with
    * valid_from ≤ v < valid_to plus current rows with valid_from ≤ v).
    */
  def asOf(store: TableStore, name: String, version: Long): DataFrame =
    history(store, name)
      .filter(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .drop("valid_to", "is_current")

  /** THE query SCD2 exists for: enrich each fact row with the
    * dimension attributes AS OF the fact's own version — "who was
    * this customer when the order shipped", not who they are today.
    * An equi-join on the dimension keys does the heavy lifting (both
    * sides hash-partition on the key, and the history side holds only
    * a few versions per key), then the validity interval selects the
    * one version covering `versionCol`; facts at versions no interval
    * covers (before the key existed) keep NULL attributes, left-join
    * semantics. At 100 TB this is the same shape as any fact→dim
    * equi-join — broadcastable when the dimension is small, never a
    * range-join explosion, because intervals per key are disjoint by
    * construction (at most one survives the filter).
    */
  def asOfJoin(
      store: TableStore,
      name: String,
      facts: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame = {
    // interval containment goes INSIDE the join condition — as a
    // post-filter it would also drop facts whose key exists but whose
    // version precedes every interval, which must instead surface
    // with NULL attributes (left semantics)
    val covered = keyCols.foldLeft(
      history(store, name).drop("is_current")
        .withColumnRenamed("valid_from", "__vf")
        .withColumnRenamed("valid_to", "__vt"))(
      (df, k) => df.withColumnRenamed(k, s"__k_$k"))
    val cond = (keyCols.map(k => col(k) === col(s"__k_$k")) :+
      (col("__vf") <= col(versionCol)) :+
      (col("__vt").isNull || col("__vt") > col(versionCol))).reduce(_ && _)
    // the matched version's valid_from stays in the output — the
    // provenance stamp of WHICH version enriched each fact
    facts.join(covered, cond, "left")
      .drop((keyCols.map(k => s"__k_$k") :+ "__vt"): _*)
      .withColumnRenamed("__vf", "valid_from")
  }

  /** Change-data-feed between versions — every change event with
    * commit version in (fromVersion, toVersion], derived entirely
    * from the history's validity intervals (no extra state table; the
    * append-only history IS the change log). Output: keys…, attrs…,
    * `change_type` ∈ {insert, update_preimage, update_postimage,
    * delete}, `commit_version` — the Delta-CDF surface, feeding the
    * standard downstream consumers (incremental materialized-view
    * maintenance, replication, audit).
    *
    * Derivation: an interval OPENING at v is an insert or an update's
    * postimage; an interval CLOSING at v is an update's preimage or a
    * delete (a retire closes without reopening). Which one is decided
    * by a full-outer self-join of openings against closings on
    * (key, version): both sides present → update pre+post, open only →
    * insert, close only → delete.
    *
    * 100 TB shape: both join inputs are version-range-filtered BEFORE
    * the join — an incremental consumer asking for (v, v+1] joins two
    * delta-sized sets regardless of history size — and the join is an
    * equi-join on (key, version), one hash shuffle, no interval logic
    * in the condition (intervals per key are disjoint, so (key,
    * version) is unique on each side).
    */
  def changes(
      store: TableStore,
      name: String,
      keyCols: Seq[String],
      fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(keyCols.nonEmpty)
    val h = history(store, name).drop("is_current")
    val attrCols =
      h.columns.toSeq.filterNot(c =>
        keyCols.contains(c) || c == "valid_from" || c == "valid_to")
    val opens = h
      .filter(col("valid_from") > fromVersion && col("valid_from") <= toVersion)
      .select((keyCols.map(col) ++
        attrCols.map(c => col(c).as(s"__o_$c")) :+
        col("valid_from").as("commit_version")): _*)
    val closes = h
      .filter(col("valid_to").isNotNull &&
        col("valid_to") > fromVersion && col("valid_to") <= toVersion)
      .select((keyCols.map(col) ++
        attrCols.map(c => col(c).as(s"__c_$c")) :+
        col("valid_to").as("commit_version")): _*)
    // presence on each side is tagged structurally BEFORE the join —
    // probing an attr column for null would misread a row whose attrs
    // are legitimately all null
    val o2 = opens.withColumn("__opened", lit(true))
    val c2 = closes.withColumn("__closed", lit(true))
    val j = o2.join(c2, keyCols :+ "commit_version", "full_outer")
    val isOpen = col("__opened") <=> lit(true)
    val isClose = col("__closed") <=> lit(true)
    val pre = j.filter(isClose)
      .select((keyCols.map(col) ++
        attrCols.map(c => col(s"__c_$c").as(c)) :+
        when(isOpen, lit("update_preimage")).otherwise(lit("delete"))
          .as("change_type") :+
        col("commit_version")): _*)
    val post = j.filter(isOpen)
      .select((keyCols.map(col) ++
        attrCols.map(c => col(s"__o_$c").as(c)) :+
        when(isClose, lit("update_postimage")).otherwise(lit("insert"))
          .as("change_type") :+
        col("commit_version")): _*)
    pre.unionByName(post)
  }

  /** The standard [[changes]] consumer: turn a change feed into the
    * signed per-group delta of a count/sum materialized view —
    * inserts and update postimages add, update preimages and deletes
    * subtract. Adding the result to the MV's stored rows advances it
    * to the feed's end version WITHOUT touching the dimension again:
    * the incremental-view-maintenance algebra (count and sum are
    * self-inverse under signed deltas; min/max are not, which is why
    * they're absent from this surface).
    *
    * Output: groupCols…, d_n (signed row delta), d_<m> per measure.
    * 100 TB shape: one aggregation over the delta-sized feed — MV
    * refresh cost tracks the CHANGE volume, not the dimension size.
    */
  def mvDelta(
      feed: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty)
    val sign = when(
      col("change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    feed
      .withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__sign")).as("d_n"),
        sumCols.map(m =>
          sum(col("__sign") * col(m)).as(s"d_$m")): _*)
  }

  /** Retention: physically drop closed intervals that ended at or
    * before `beforeVersion`. Current rows never expire (the live
    * dimension is always complete); [[asOf]] and [[changes]] at
    * versions ≤ the cutoff become intentionally incomplete — that IS
    * vacuum's contract, trading history depth for storage, exactly as
    * Delta's VACUUM bounds time travel. Only cells actually holding an
    * expired row rewrite (the touched-partition discipline of every
    * mutation here); a re-run finds nothing expired and touches
    * nothing. Returns rows removed.
    */
  def vacuum(store: TableStore, name: String, beforeVersion: Long): Long = {
    val ct = closedTable(name)
    if (!store.exists(ct)) return 0L
    val closed = store.read(ct)
    val expired = closed.filter(col("valid_to") <= beforeVersion)
    val cells = expired.select(col("cell").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (cells.isEmpty) return 0L
    val n = expired.count()
    val survivors = closed
      .filter(col("cell").cast("string").isin(cells: _*))
      .filter(col("valid_to") > beforeVersion)
    store.rewritePartitioned(survivors, ct, "cell", cells)
    n
  }

  /** Collapse the per-merge file accumulation in both tables — every
    * delta merge leaves one file set per rewritten current shard and
    * one per closed-row append; the same out-of-band compaction
    * discipline as the dedup/index state tables. Returns partitions
    * rewritten.
    */
  def compact(
      store: TableStore,
      name: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int =
    Seq(currentTable(name), closedTable(name))
      .filter(store.exists)
      .map(t => store.compact(t, "cell", targetFileBytes))
      .sum
}
