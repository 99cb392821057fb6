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

  /** The pre-star two-table cursor's table name — kept only so
    * [[follow]] can ADOPT a surviving view built before the star
    * generalization instead of silently full-reseeding it.
    */
  private def legacyCursorTable(name: String) = s"${name}__jmv_cursor"

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
    // MIGRATION: a view built by the pre-star follow persists its
    // cursor as `__jmv_cursor` (fact_v, dim_v). Adopt it into the
    // star cursor ONCE — identity columns take this call's tables and
    // keys, the same trust the legacy cursor carried (it stored none)
    // — so the view advances incrementally instead of full-reseeding.
    // The legacy table is left in place, inert (the star cursor's
    // existence gates this branch off forever after).
    if (MvStore.exists(store, name) &&
        !store.exists(cursorStarTable(name)) &&
        store.exists(legacyCursorTable(name))) {
      val spark = store.spark
      import spark.implicits._
      val r = store.read(legacyCursorTable(name))
        .select("fact_v", "dim_v").head()
      store.overwrite(Seq(
        (0, r.getInt(0), factDir, ""),
        (1, r.getInt(1), dimDir, joinKeys.mkString(",")))
        .toDF("idx", "ver", "tbl", "keys"), cursorStarTable(name))
    }
    // the two-table form IS the one-dim star — one cursor machinery,
    // one pending-intent protocol, one delta construction
    val rs = followStar(store, name, factDir, Seq((dimDir, joinKeys)),
      groupCols, sumCols, minMaxCols)
    (rs(0), rs(1))
  }

  /** The OLD-side scan of `dir` for a term whose delta is `feed`,
    * pruned when the (single) join key is a column OF THIS TABLE
    * with usable bounds: numeric + declared log stats → file-level
    * [[TxLog.snapshotPruned]] over the changed keys' widened
    * [min, max] (1 ULP out each side — the double cast rounds
    * integral keys past 2^53); string → FILE-level skipping from the
    * footers' lexicographic manifest ([[TxLog.snapshotPrunedString]],
    * unsigned UTF-8 order, the same total order Spark compares in)
    * plus the residual range predicate row-group stats serve inside
    * the surviving files. A key the table
    * does not spell (snowflake terms — the delta joins a column an
    * earlier dim produced) reads whole; an empty delta reads
    * nothing.
    */
  private def prunedOld(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      fromV: Int,
      feed: DataFrame,
      keys: Seq[String]): DataFrame = {
    val whole = TxLog.snapshot(spark, dir, fromV)
    if (feed.isEmpty) return whole.limit(0)
    if (keys.sizeIs != 1 || !whole.columns.contains(keys.head))
      return whole
    val k = keys.head
    whole.schema(k).dataType match {
      case _: org.apache.spark.sql.types.NumericType
          if TxLog.statsColumns(spark, dir).contains(k) =>
        val b = feed.agg(min(col(k).cast("double")),
          max(col(k).cast("double"))).head()
        if (b.isNullAt(0)) whole.limit(0)
        else TxLog.snapshotPruned(spark, dir, k,
          Math.nextDown(b.getDouble(0)), Math.nextUp(b.getDouble(1)),
          fromV)
      case org.apache.spark.sql.types.StringType =>
        val b = feed.agg(min(col(k)), max(col(k))).head()
        if (b.isNullAt(0)) whole.limit(0)
        else
          // FILE-level skipping from the footers' lexicographic
          // manifest (unsigned UTF-8 order — Spark's own string
          // order), then the residual range predicate row-group stats
          // serve inside the survivors: an unclustered fact skips
          // whole files, not just row groups
          TxLog.snapshotPrunedString(spark, dir, k,
            b.getString(0), b.getString(1), fromV)
      case _ => whole
    }
  }

  private def cursorStarTable(name: String) = s"${name}__jmvs_cursor"

  /** N-TABLE incremental join view — the star/snowflake
    * generalization of [[follow]]: a fact joined through `dims` (in
    * order — each dim's USING keys must resolve against the
    * ACCUMULATED join, so a snowflake chain where dim 2 joins a
    * column dim 1 produced is expressed by listing them in chain
    * order). The delta algebra telescopes exactly:
    *
    *   Δ(T₀⋈…⋈Tₙ) = Σᵢ T₀ᵒˡᵈ⋈…⋈Tᵢ₋₁ᵒˡᵈ ⋈ ΔTᵢ ⋈ Tᵢ₊₁ⁿᵉʷ⋈…⋈Tₙⁿᵉʷ
    *
    * (each summand joins everything LEFT of the delta at its old
    * version and everything RIGHT at its new one, so consecutive
    * summands cancel pairwise and the sum is new − old — no row
    * double-counted however many tables churned in one advance).
    * Every summand is a signed change feed; all of them union into
    * ONE [[MvStore.refresh]] batch, inheriting replay stamps, the
    * writer fence and touched-shard rewrites. One cursor row per
    * table persists in the store.
    *
    * 100 TB shape: term i reads ΔTᵢ (O(churn)) joined against dims
    * (broadcast when small), and the FACT is re-read at most once
    * per churned dim — each such read pruned by [[prunedOld]] when
    * the dim keys on a fact column with stats; tables with no churn
    * in the window contribute no term at all. `minMaxCols` as in
    * [[follow]] (dirty groups recompute from the full joined NEW
    * state, semi-pruned inside refresh).
    */
  def followStar(
      store: TableStore,
      name: String,
      factDir: String,
      dims: Seq[(String, Seq[String])],
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): Seq[(Int, Int)] = {
    require(dims.nonEmpty, "followStar: at least one dimension")
    val spark = store.spark
    import spark.implicits._
    val dirs = factDir +: dims.map(_._1)
    val keysFor = dims.map(_._2)
    val keyStr: Int => String =
      i => if (i == 0) "" else keysFor(i - 1).mkString(",")
    val keep = (groupCols ++ sumCols ++ minMaxCols).distinct
    def snapAt(i: Int, v: Int) = TxLog.snapshot(spark, dirs(i), v)
    def joinedAt(vs: Seq[Int]): DataFrame =
      dims.indices.foldLeft(snapAt(0, vs(0)))((acc, j) =>
        acc.join(snapAt(j + 1, vs(j + 1)), keysFor(j)))
        .select(keep.map(col): _*)
    // the cursor pins IDENTITY alongside versions: a later call with
    // the same arity but different tables (or keys) must refuse, not
    // feed an unrelated table's diff into the state
    def pin(vs: Seq[Int]): Unit =
      store.overwrite(vs.zipWithIndex.map { case (v, i) =>
        (i, v, dirs(i), keyStr(i)) }.toDF("idx", "ver", "tbl", "keys"),
        cursorStarTable(name))
    def seed(): Seq[(Int, Int)] = {
      val curs = dirs.map(TxLog.currentVersion(spark, _))
      MvStore.init(store, name, joinedAt(curs), groupCols, sumCols,
        batchId = s"seed_${curs.mkString("_")}",
        minMaxCols = minMaxCols)
      pin(curs)
      curs.map(v => (v, v))
    }
    if (!MvStore.exists(store, name) ||
        !store.exists(cursorStarTable(name)))
      return seed()
    val curRows = store.read(cursorStarTable(name)).orderBy("idx")
      .select("ver", "tbl", "keys").collect()
    require(curRows.length == dirs.length,
      s"followStar('$name'): cursor spans ${curRows.length} tables, " +
        s"call names ${dirs.length} — the view was built with a " +
        "different table list")
    curRows.zipWithIndex.foreach { case (r, i) =>
      require(r.getString(1) == dirs(i) && r.getString(2) == keyStr(i),
        s"followStar('$name'): position $i was built over " +
          s"${r.getString(1)} [${r.getString(2)}], this call names " +
          s"${dirs(i)} [${keyStr(i)}] — same-arity table/key drift " +
          "would apply an unrelated diff; recreate the view or fix " +
          "the call")
    }
    val from = curRows.map(_.getInt(0)).toSeq
    // PENDING INTENT: the advance's TARGET versions persist BEFORE
    // the refresh, so a retry after a crash resumes the EXACT window
    // the stamped batch covered — without it, a source committing
    // between crash and retry would change the batch id, the stamp
    // would not recognize the replay, and the old window would apply
    // twice. A pending row matches only while `from` still equals the
    // window start (the pin moving makes it stale by construction, no
    // cleanup write needed); a pending target pruned away by a racing
    // vacuum falls back to the live versions.
    val pendingT = s"${name}__jmvs_pending"
    val curs: Seq[Int] = {
      val now = dirs.map(TxLog.currentVersion(spark, _))
      // TOLERANT read — a crash inside the pending overwrite itself
      // must read as NO pending (that window's refresh provably had
      // not started), never wedge on an unreadable table; same guard
      // as MvStore.followTxLog's
      val resumed: Option[Seq[Int]] =
        if (!store.exists(pendingT)) None
        else scala.util.Try(store.read(pendingT).orderBy("idx")
            .select("fromv", "tov").collect()).toOption
          .flatMap { p =>
            if (p.length == dirs.length &&
                p.map(_.getInt(0)).toSeq == from &&
                p.map(_.getInt(1)).zip(dirs).forall { case (v, d) =>
                  TxLog.retainedVersions(spark, d).contains(v) })
              Some(p.map(_.getInt(1)).toSeq)
            else None
          }
      resumed.getOrElse(now)
    }
    if (from == curs) return from.zip(curs)
    if (from.zip(dirs).exists { case (f, d) =>
        !TxLog.retainedVersions(spark, d).contains(f) })
      return seed() // fell behind a retention horizon
    store.overwrite(from.zip(curs).zipWithIndex.map {
      case ((f, t), i) => (i, f, t) }.toDF("idx", "fromv", "tov"),
      pendingT)
    val feeds: Seq[Option[DataFrame]] = dirs.indices.map { i =>
      if (from(i) == curs(i)) None
      else Some(TxLog.asChangeFeed(
        TxLog.diff(spark, dirs(i), from(i), curs(i))).localCheckpoint())
    }
    val cols = (keep :+ "change_type").map(col)
    val terms: Seq[DataFrame] = dirs.indices.flatMap { i =>
      feeds(i).map { fd =>
        if (i == 0)
          // ΔF ⋈ every dim at its NEW version
          dims.indices.foldLeft(fd)((acc, j) =>
            acc.join(snapAt(j + 1, curs(j + 1)), keysFor(j)))
            .select(cols: _*)
        else {
          // T₀ᵒˡᵈ…Tᵢ₋₁ᵒˡᵈ ⋈ ΔTᵢ ⋈ Tᵢ₊₁ⁿᵉʷ…Tₙⁿᵉʷ — the fact's old
          // read pruned by THIS dim's changed keys where possible
          val f0 = prunedOld(spark, factDir, from(0), fd, keysFor(i - 1))
          val left = (1 until i).foldLeft(f0)((acc, j) =>
            acc.join(snapAt(j, from(j)), keysFor(j - 1)))
          val mid = left.join(fd, keysFor(i - 1))
          ((i + 1) to dims.length).foldLeft(mid)((acc, j) =>
            acc.join(snapAt(j, curs(j)), keysFor(j - 1)))
            .select(cols: _*)
        }
      }
    }
    MvStore.refresh(store, name, terms.reduce(_ unionByName _),
      groupCols, sumCols,
      batchId = Some(
        s"star_${from.mkString("_")}__${curs.mkString("_")}"),
      minMaxCols = minMaxCols,
      current = if (minMaxCols.isEmpty) None else Some(joinedAt(curs)))
    pin(curs)
    from.zip(curs)
  }
}
