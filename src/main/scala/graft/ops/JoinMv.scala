package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.TableStore

/** Incremental materialized view over a TWO-TABLE equi-join — the
  * aggregate-over-join shape ("revenue by customer segment") kept in
  * step with BOTH source tables' transaction logs without ever
  * rescanning the join. The delta algebra is the classic incremental
  * view maintenance identity
  *
  *     Δ(F ⋈ D)  =  ΔF ⋈ D_new  +  F_old ⋈ ΔD
  *
  * which is EXACT: the cross term ΔF ⋈ ΔD lands inside the first
  * summand because ΔF joins the dimension at its NEW version, while
  * the second summand joins the dim delta against the fact at its OLD
  * version — no row is double-counted however the two tables churned
  * within one advance. Both summands are signed change-feed rows
  * (insert/postimage add, delete/preimage subtract), unioned into ONE
  * [[MvStore.refresh]] batch over the same sharded count/sum state —
  * so replay detection, the writer fence, touched-shard-only rewrites
  * and zero-group removal are inherited, not re-implemented.
  *
  * Cursors for BOTH logs persist in the store; crash between refresh
  * and cursor write replays the same version window and the batch
  * stamp recognizes it (exactly-once effect, at-least-once
  * execution). A cursor that fell behind either log's retention
  * horizon reseeds from the current snapshots — the standard
  * CDF-retention contract, same as [[MvStore.followTxLog]].
  *
  * 100 TB shape: the fact-side term costs O(fact churn) joined to the
  * dimension (broadcast when small). The dim-side term is the
  * inherent IVM cost — a changed dimension row must revisit every old
  * fact row it joins — but the fact scan PRUNES to the changed keys'
  * stats range when the fact declares log-carried stats on the join
  * key ([[TxLog.snapshotPruned]]); a dim batch with no changes skips
  * the fact entirely. Neither term ever reads the view's untouched
  * shards, and the view itself stays ndv-of-groups sized.
  */
object JoinMv {

  private def cursorTable(name: String) = s"${name}__jmv_cursor"

  /** The view (same state as any [[MvStore]] view). */
  def read(store: TableStore, name: String): DataFrame =
    MvStore.read(store, name)

  /** Advance (or seed) the view to both tables' current versions.
    * `joinKeys` are USING-style columns spelled identically on both
    * sides; `groupCols`/`sumCols` may come from either side but must
    * be unambiguous after the join. Returns ((factFrom, factTo),
    * (dimFrom, dimTo)) — from == to on a side means nothing new
    * there.
    *
    * `minMaxCols` opts the view into MIN/MAX measures —
    * [[MvStore]]'s grow-only/dirty-recompute discipline carried
    * through the join: additions grow the stored extremes in place
    * (no source read), while a group hit by any delete/preimage row
    * re-derives its extremes from the POST-CHANGE JOINED state
    * (F_new ⋈ D_new, semi-join-pruned to the dirty groups inside
    * [[MvStore.refresh]]) — the standard IVM answer for
    * non-invertible aggregates, now over two tables.
    */
  def follow(
      store: TableStore,
      name: String,
      factDir: String,
      dimDir: String,
      joinKeys: Seq[String],
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): ((Int, Int), (Int, Int)) = {
    val spark = store.spark
    import spark.implicits._
    val cF = TxLog.currentVersion(spark, factDir)
    val cD = TxLog.currentVersion(spark, dimDir)
    val keep = (groupCols ++ sumCols ++ minMaxCols).distinct
    def joinedAt(vf: Int, vd: Int) =
      TxLog.snapshot(spark, factDir, vf)
        .join(TxLog.snapshot(spark, dimDir, vd), joinKeys)
        .select(keep.map(col): _*)
    def pin(vf: Int, vd: Int): Unit =
      store.overwrite(Seq((vf, vd)).toDF("fact_v", "dim_v"),
        cursorTable(name))
    def seed(): ((Int, Int), (Int, Int)) = {
      MvStore.init(store, name, joinedAt(cF, cD),
        groupCols, sumCols, batchId = s"seed_f${cF}_d$cD",
        minMaxCols = minMaxCols)
      pin(cF, cD)
      ((cF, cF), (cD, cD))
    }
    if (!MvStore.exists(store, name) || !store.exists(cursorTable(name)))
      return seed()
    val cur = store.read(cursorTable(name)).select("fact_v", "dim_v").head()
    val (fromF, fromD) = (cur.getInt(0), cur.getInt(1))
    if (fromF == cF && fromD == cD) return ((fromF, cF), (fromD, cD))
    if (!TxLog.retainedVersions(spark, factDir).contains(fromF) ||
        !TxLog.retainedVersions(spark, dimDir).contains(fromD))
      return seed() // fell behind a retention horizon: one reseed scan
    val feedF = TxLog.asChangeFeed(TxLog.diff(spark, factDir, fromF, cF))
      .localCheckpoint() // read twice is never worth re-diffing
    val feedD = TxLog.asChangeFeed(TxLog.diff(spark, dimDir, fromD, cD))
      .localCheckpoint()
    val dimNew = TxLog.snapshot(spark, dimDir, cD)
    // F_old, pruned: a single numeric join key with declared stats
    // bounds the fact scan to the changed keys' [min, max] (scattered
    // keys widen the range back to the full scan — harmless, one
    // 1-row agg); an empty dim delta skips the fact read entirely
    val fOld: DataFrame = {
      val whole = TxLog.snapshot(spark, factDir, fromF)
      lazy val keyType = whole.schema(joinKeys.head).dataType
      if (feedD.isEmpty) whole.limit(0)
      else if (joinKeys.sizeIs == 1 &&
          TxLog.statsColumns(spark, factDir).contains(joinKeys.head) &&
          keyType.isInstanceOf[org.apache.spark.sql.types.NumericType]) {
        val k = joinKeys.head
        val b = feedD.agg(min(col(k).cast("double")),
          max(col(k).cast("double"))).head()
        if (b.isNullAt(0)) whole.limit(0)
        // the double cast ROUNDS integral keys beyond 2^53 (≤½ ULP
        // each way) — a rounded-up min / rounded-down max could prune
        // a file holding a true changed key, silently dropping rows
        // from the F_old term. Widening each bound a full ULP covers
        // the rounding of both the key and the file's stored stats;
        // at worst one extra file scans.
        else TxLog.snapshotPruned(spark, factDir, k,
          Math.nextDown(b.getDouble(0)), Math.nextUp(b.getDouble(1)), fromF)
      } else if (joinKeys.sizeIs == 1 &&
          keyType == org.apache.spark.sql.types.StringType) {
        // STRING join key: bound the scan with a lexicographic range
        // predicate over the changed keys — Spark pushes it to the
        // parquet scan, whose own binary stats (unsigned UTF-8 byte
        // order, the same total order Spark's min/max/comparisons
        // use) skip every row group outside the span. Semantics-
        // preserving: an F_old row outside [min, max] of the changed
        // keys cannot equi-join any feedD row.
        val k = joinKeys.head
        val b = feedD.agg(min(col(k)), max(col(k))).head()
        if (b.isNullAt(0)) whole.limit(0)
        else whole.filter(col(k) >= lit(b.getString(0)) &&
          col(k) <= lit(b.getString(1)))
      } else whole
    }
    val cols = (keep :+ "change_type").map(col)
    val t1 = feedF.join(dimNew, joinKeys).select(cols: _*)
    val t2 = fOld.join(feedD, joinKeys).select(cols: _*)
    MvStore.refresh(store, name, t1.unionByName(t2), groupCols, sumCols,
      batchId = Some(s"f${fromF}_${cF}_d${fromD}_$cD"),
      minMaxCols = minMaxCols,
      current = if (minMaxCols.isEmpty) None else Some(joinedAt(cF, cD)))
    pin(cF, cD)
    ((fromF, cF), (fromD, cD))
  }
}
