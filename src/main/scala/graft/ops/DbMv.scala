package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental JOIN materialized views over a [[DbLog]] database —
  * the feature the shared version sequence exists to enable. A view
  * `SELECT g…, count(*), sum(m) FROM fact JOIN dim GROUP BY g…`
  * spans TWO tables, so refreshing it incrementally needs both
  * tables' change feeds read over the SAME version interval: with
  * one log per table (the Delta CDF situation) the two cursors can
  * only be aligned by luck, and a transaction that moves rows
  * between the tables tears across the feeds. Here both feeds come
  * from one `(from, to]` on the database's single log
  * ([[DbLog.diff]]), so every multi-table transaction lands in the
  * delta whole.
  *
  * Maintenance is the classic delta-join algebra (the standard
  * derivation found in any incremental view maintenance treatment,
  * e.g. Gupta & Mumick's survey):
  *
  *   Δ(F ⋈ D)  =  ΔF ⋈ D_old  ∪  F_new ⋈ ΔD
  *
  * exact including the ΔF⋈ΔD cross term (it lives in the second
  * term because F_new already contains ΔF). Signs ride the feeds:
  * an insert contributes `+m`, a delete `-m`; the per-group signed
  * sums then fold into the stored (count, sum) state, and groups
  * whose count reaches zero leave the view.
  *
  * State, definition and cursor are tables IN the same database,
  * written by the refresh's own transaction — so the cursor advances
  * atomically with the state it describes. A crashed refresh
  * publishes nothing; a replayed refresh sees `from == to` and
  * no-ops; two racing refreshes conflict on the state files and the
  * loser's retry no-ops. Exactly-once maintenance with no
  * coordination beyond the log's own commit claim.
  *
  * 100 TB shape: a refresh reads O(files changed since the cursor)
  * for both feeds (changed-files-only diff), one snapshot-sized
  * probe of the fact side restricted by the join to ΔD's keys
  * (broadcast when small — the usual case: dims churn slowly), and
  * rewrites the aggregate-sized state (size = live groups, not
  * source rows). If the cursor falls behind the vacuum horizon the
  * view reseeds from the current snapshot rather than failing
  * forever — size retention to the refresh cadence. For views whose
  * GROUP BY cardinality itself approaches data scale, the sharded
  * touched-cells-only [[MvStore]] is the right state backend; this
  * store's contribution is the transactional cursor.
  *
  * Reference anchor: the reference's stated end goal is total
  * emission "on a brand level, car level, and driver level"
  * (reference `README.md:3`), computed by re-running full
  * warehouse-wide join-aggregate SQL over the tables the DAG reloads
  * every cycle (`dags/emission-dag.py:214-224` schedules the whole
  * transform-and-load each run); this is the incremental form of
  * those same join-aggregates.
  */
object DbMv {

  private val ViewName = "[A-Za-z_][A-Za-z0-9_]*".r

  /** The view's definition: an inner equi-join of `fact` and `dim`
    * on `factKey == dimKey`, grouped by `groupCols` (columns of the
    * joined relation, either side), aggregating `count(*)` and
    * `sum(sumCol)` (a fact-side metric). Fact and dim must not
    * share column names (TPC-H-style prefixes) so the join needs no
    * disambiguation. Prefer an exact-typed metric (decimal/long):
    * the incremental fold adds and CANCELS contributions in feed
    * order, so float sums drift from a direct recompute by ulps.
    */
  final case class JoinView(
      fact: String,
      dim: String,
      factKey: String,
      dimKey: String,
      groupCols: Seq[String],
      sumCol: String) {
    require(factKey != dimKey,
      s"factKey and dimKey must differ in name (got '$factKey' both sides) " +
        "— the joined relation keeps both")
    require(!groupCols.contains("mv_count") && sumCol != "mv_count",
      "'mv_count' is reserved for the view's count column")
  }

  private def defTable(name: String) = s"mv_${name}_def"
  private def stateTable(name: String) = s"mv_${name}_state"
  private def cursorTable(name: String) = s"mv_${name}_cursor"

  private def requireViewName(name: String): Unit =
    require(ViewName.pattern.matcher(name).matches(),
      s"view names must match [A-Za-z_][A-Za-z0-9_]* — got '$name'")

  /** The view's value over explicit relations — the one aggregation
    * both the seed and the spec-side recompute share.
    */
  private def joinAgg(f: DataFrame, d: DataFrame, v: JoinView): DataFrame = {
    val shared = f.columns.toSet.intersect(d.columns.toSet)
    require(shared.isEmpty,
      s"fact and dim share column names ${shared.mkString(", ")} — rename first")
    f.join(d, f(v.factKey) === d(v.dimKey))
      .groupBy(v.groupCols.map(col): _*)
      .agg(count(lit(1)).as("mv_count"), sum(col(v.sumCol)).as("mv_sum"))
  }

  /** `insert` rows keep the metric's sign, `delete` rows flip it —
    * negation, not multiplication, so the metric's exact type
    * (decimal scale included) survives untouched.
    */
  private def signed(feed: DataFrame, v: JoinView): DataFrame =
    feed
      .withColumn("_dc",
        when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L)))
      .withColumn("_dm",
        when(col("_change_type") === "insert", col(v.sumCol))
          .otherwise(-col(v.sumCol)))
      .drop("_change_type")

  /** Register the view and seed state + cursor at the current
    * version, all in ONE transaction. Returns the committed version.
    */
  def init(
      spark: SparkSession,
      db: String,
      name: String,
      view: JoinView): Int = {
    requireViewName(name)
    require(!DbLog.tables(spark, db).contains(defTable(name)),
      s"view '$name' already exists in $db")
    import spark.implicits._
    val txn = DbLog.begin(spark, db)
    val seeded = joinAgg(txn.table(view.fact), txn.table(view.dim), view)
    txn.append(defTable(name),
      Seq((view.fact, view.dim, view.factKey, view.dimKey,
        view.groupCols.mkString(","), view.sumCol))
        .toDF("fact", "dim", "fact_key", "dim_key", "group_cols", "sum_col"))
    txn.append(stateTable(name), seeded.repartition(1))
    // cursor = the cut the seed READ, not the version this commit
    // lands at: a concurrent fact/dim commit can slot in between, and
    // the first refresh must replay it. Replaying this commit's own
    // version is free — it touches only mv_* tables, so both feeds
    // are empty over it.
    txn.append(cursorTable(name), Seq(txn.baseVersion).toDF("version"))
    txn.commit(s"mv_init($name)")
  }

  /** The stored definition, read back at `version` (default
    * current).
    */
  def definition(
      spark: SparkSession,
      db: String,
      name: String,
      version: Int = Int.MaxValue): JoinView = {
    requireViewName(name)
    val r = DbLog.snapshot(spark, db, defTable(name), version).head()
    JoinView(r.getString(0), r.getString(1), r.getString(2), r.getString(3),
      r.getString(4).split(",").toSeq, r.getString(5))
  }

  /** The view's rows: `groupCols…, mv_count, mv_sum`. An empty view
    * (every group cancelled) reads as the empty relation with the
    * right schema.
    */
  def read(
      spark: SparkSession,
      db: String,
      name: String,
      version: Int = Int.MaxValue): DataFrame = {
    val v = definition(spark, db, name, version)
    if (DbLog.tables(spark, db, version).contains(stateTable(name)))
      DbLog.snapshot(spark, db, stateTable(name), version)
    else
      joinAgg(DbLog.snapshot(spark, db, v.fact, version).limit(0),
        DbLog.snapshot(spark, db, v.dim, version).limit(0), v)
  }

  /** Advance the view to the database's current version. Both change
    * feeds, the state rewrite and the cursor move ride ONE commit.
    * Returns `(from, to)`; `from == to` means there was nothing to
    * do and nothing was committed.
    */
  def refresh(spark: SparkSession, db: String, name: String): (Int, Int) = {
    requireViewName(name)
    import spark.implicits._
    val txn = DbLog.begin(spark, db)
    val to = txn.baseVersion
    val view = definition(spark, db, name, to)
    val from = txn.table(cursorTable(name)).head().getInt(0)
    if (from == to) return (from, to)

    // fixpoint gate, metadata only: if neither source's (file, dv)
    // entry set changed over (from, to] — e.g. the only commits were
    // this view's own refreshes — do NOT commit a new version, or
    // refresh would chase its own tail forever. The cursor stays put;
    // the skipped interval is provably empty in both feeds.
    def changed(table: String): Boolean = {
      def ents(v: Int) = TxLog.liveEntries(spark, db, v)
        .filter(_.name.startsWith(table + "/")).map(e => (e.name, e.dv)).toSet
      if (!TxLog.retainedVersions(spark, db).contains(from)) true
      else ents(from) != ents(to)
    }
    if (!changed(view.fact) && !changed(view.dim))
      return hopOrNoop(spark, db, name, txn, from, to)

    if (!TxLog.retainedVersions(spark, db).contains(from)) {
      // behind the vacuum horizon: the feed from `from` is gone —
      // reseed from the current cut (one scan), re-pin
      val seeded = joinAgg(txn.table(view.fact), txn.table(view.dim), view)
      txn.overwrite(stateTable(name), seeded.repartition(1))
      txn.overwrite(cursorTable(name), Seq(to).toDF("version"))
      txn.commit(s"mv_reseed($name)")
      return (from, to)
    }

    val dF = signed(DbLog.diff(spark, db, view.fact, from, to), view)
    val dD = DbLog.diff(spark, db, view.dim, from, to)
      .withColumn("_dc",
        when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L)))
      .drop("_change_type")
    val dOld = DbLog.snapshot(spark, db, view.dim, from)
    val fNew = txn.table(view.fact)

    val gcols = view.groupCols.map(col)
    // ΔF ⋈ D_old: the fact feed priced against the dim AS IT WAS
    val t1 = dF.join(dOld, dF(view.factKey) === dOld(view.dimKey))
      .select(gcols :+ col("_dc") :+ col("_dm"): _*)
    // F_new ⋈ ΔD: dim churn re-prices the CURRENT fact rows (covers
    // the ΔF⋈ΔD cross term — F_new already contains ΔF). Dim deltas
    // are churn-sized: broadcast them under the fact scan.
    val dDs = broadcast(dD)
    val t2 = fNew.join(dDs, fNew(view.factKey) === dDs(view.dimKey))
      .select(gcols :+ dDs("_dc") :+
        (dDs("_dc") * fNew(view.sumCol)).cast(
          dF.schema("_dm").dataType).as("_dm"): _*)
    val delta = t1.unionByName(t2)
      .groupBy(gcols: _*)
      .agg(sum(col("_dc")).as("d_cnt"), sum(col("_dm")).as("d_sum"))

    val state =
      if (txn.tableExists(stateTable(name))) txn.table(stateTable(name))
      else // every group cancelled earlier: zero files = empty state
        joinAgg(fNew.limit(0), dOld.limit(0), view)
    val cntT = state.schema("mv_count").dataType
    val sumT = state.schema("mv_sum").dataType
    val merged = state.join(delta, view.groupCols, "full_outer")
      .select((view.groupCols.map(col) :+
        (coalesce(col("mv_count"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .cast(cntT).as("mv_count") :+
        (coalesce(col("mv_sum"), lit(0).cast(sumT)) +
          coalesce(col("d_sum"), lit(0).cast(sumT)))
          .cast(sumT).as("mv_sum")): _*)
      .filter(col("mv_count") =!= 0L)

    txn.overwrite(stateTable(name), merged.repartition(1))
    txn.overwrite(cursorTable(name), Seq(to).toDF("version"))
    txn.commit(s"mv_refresh($name)")
    (from, to)
  }

  // ===================================================================
  // N-TABLE STAR/SNOWFLAKE form — [[JoinMv.followStar]]'s telescoping
  // delta algebra carried onto the DbLog database, KEEPING this
  // store's defining property (state, definition and cursor advance in
  // the refresh's OWN transaction — the atomic-cursor guarantee
  // [[JoinMv]] cannot give) and DROPPING the `repartition(1)` state
  // economics: the state table is maintained MERGE-ON-READ through
  // [[DbLog.Txn.applyKeyed]] — one deletion vector hides the touched
  // groups' old rows, one append lands their new rows — so a refresh
  // writes O(touched groups), never O(view), which is strictly tighter
  // than shard-level rewrites (a shard rewrite repays every group that
  // happens to share a shard with a touched one). The trade is
  // accumulated small files + vectors, reclaimed by the ordinary table
  // maintenance ([[DbLog.compactTable]] after
  // [[DeletionVectors.materialize]] — the state is just a table).
  // ===================================================================

  /** An N-table star/snowflake view over tables of ONE database:
    * `fact` joined through `dims` in chain order (each dim's
    * USING-style keys must resolve against the accumulated join, so a
    * snowflake where dim 2 joins a column dim 1 produced lists them
    * in that order). Aggregates `count(*)` (as `mv_count`),
    * `sum(<m>)` per sumCol (as `sum_<m>`, stored double) and
    * opt-in `min_<m>`/`max_<m>` per minMaxCol.
    */
  final case class StarView(
      fact: String,
      dims: Seq[(String, Seq[String])],
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil,
      reserveK: Int = 0) {
    require(dims.nonEmpty, "StarView: at least one dimension")
    require(groupCols.nonEmpty, "StarView: groupCols must be non-empty")
    require(reserveK >= 0 && reserveK <= 4096,
      s"StarView: reserveK must be in [0, 4096], got $reserveK")
    private[DbMv] def tables: Seq[String] = fact +: dims.map(_._1)
    private[DbMv] def keep: Seq[String] =
      (groupCols ++ sumCols ++ minMaxCols).distinct
    (dims.flatMap(_._2) ++ groupCols ++ sumCols ++ minMaxCols).foreach(c =>
      require(!c.exists(";:+".contains(_)),
        s"StarView: column '$c' spells a definition-codec delimiter"))
  }

  /** Post-merge reserve state of one measure: the two extreme
    * prefixes, the non-null value count, and whether the group must
    * recompute (a reserve drained while values remain).
    */
  final case class ReserveState(
      minres: Seq[Double], maxres: Seq[Double], nn: Long, dirty: Boolean)

  /** BOUNDED EXTREME RESERVES — the IVM answer that makes MIN/MAX
    * maintenance O(churn) instead of O(rows-of-dirty-groups) for the
    * overwhelmingly common churn: alongside `min_m`/`max_m` the state
    * stores the K SMALLEST and K LARGEST live values of each group
    * (`minres_m` ascending / `maxres_m` descending, exact multiset
    * prefixes of the group's ordered values). A delete of a value
    * INSIDE a prefix pops it from the array; a delete beyond the
    * prefix cannot affect the extreme and is a no-op; an add merges
    * in (truncated back to K). Only when a prefix DRAINS while the
    * group still has values — at least K deletes all hitting the same
    * extreme end — does the group fall back to the source recompute.
    * A scattered churn deleting random rows almost never drains a
    * prefix, so the advance skips the post-change source join
    * entirely. The algebra is conservative: any inconsistency
    * (a within-prefix delete whose value is absent) marks the group
    * dirty rather than guessing.
    */
  private[ops] object ExtremeReserve {

    /** One side's algebra over ASCENDING arrays (the max side negates
      * in and out). `res0` is the stored prefix, `nnOld` the group's
      * non-null count before the batch, `dels` the batch's ≤ K+1
      * smallest deleted values (ascending), `adds` its ≤ K smallest
      * added values (ascending), `nnNew` the post-batch count.
      * Returns the new prefix and the dirty flag.
      *
      * Soundness sketch: the prefix invariant — `res` equals the
      * first `res.length` elements of the group's sorted live
      * multiset — is preserved by every step. Removing an instance
      * of a value ≤ res.last shortens the prefix by one and keeps it
      * a prefix (multiset identity makes WHICH equal instance was
      * physically deleted irrelevant); removing a value beyond
      * res.last cannot change the first elements; an add enters only
      * when provably inside the prefix (≤ res.last, or the reserve is
      * COMPLETE — length == live count — so everything is inside).
      * Carrying only the K+1 smallest deletes is enough: if more
      * fall inside the prefix, the prefix drains on those alone and
      * the group recomputes anyway.
      */
    def applySide(
        res0: Seq[Double], nnOld: Long, dels: Seq[Double],
        adds: Seq[Double], nnNew: Long, k: Int): (Seq[Double], Boolean) = {
      val r = scala.collection.mutable.ArrayBuffer(res0: _*)
      val complete = r.length.toLong == nnOld
      var dirty = false
      val dIt = dels.iterator
      while (dIt.hasNext && !dirty) {
        val d = dIt.next()
        if (r.isEmpty) dirty = true
        else if (complete || d <= r.last) {
          val i = r.indexOf(d)
          if (i < 0) dirty = true else r.remove(i)
        } // beyond the prefix: the extreme end is unaffected
      }
      if (!dirty) {
        adds.foreach { a =>
          if (complete || (r.nonEmpty && a <= r.last)) {
            val i = {
              val j = r.indexWhere(_ > a)
              if (j < 0) r.length else j
            }
            r.insert(i, a)
          }
        }
        if (r.length > k) r.remove(k, r.length - k)
      }
      if (!dirty && r.isEmpty && nnNew > 0) dirty = true
      (r.toSeq, dirty)
    }

    /** Both sides at once — what the refresh's per-group UDF calls.
      * Max side runs the same ascending algebra on negated values.
      */
    def apply(
        minres: Seq[Double], maxres: Seq[Double], nnOld: Long,
        delMin: Seq[Double], addMin: Seq[Double],
        delMax: Seq[Double], addMax: Seq[Double],
        dNn: Long, k: Int): ReserveState = {
      val nnNew = nnOld + dNn
      val (mn, dirtyMin) = applySide(minres, nnOld, delMin, addMin, nnNew, k)
      val (mxNeg, dirtyMax) = applySide(
        maxres.map(-_), nnOld, delMax.map(-_), addMax.map(-_), nnNew, k)
      ReserveState(mn, mxNeg.map(-_), nnNew, dirtyMin || dirtyMax)
    }
  }

  private def sdefTable(name: String) = s"mv_${name}_sdef"

  private def encodeDims(dims: Seq[(String, Seq[String])]): String =
    dims.map { case (t, ks) => s"$t:${ks.mkString("+")}" }.mkString(";")
  private def decodeDims(s: String): Seq[(String, Seq[String])] =
    s.split(";").toSeq.map { part =>
      val Array(t, ks) = part.split(":", 2)
      (t, ks.split("\\+").toSeq)
    }

  /** The quiet-view branch of a refresh: nothing RELEVANT churned in
    * `(from, to]`. If the window's churn is confined to MV machinery
    * tables (`mv_*` — this view's own state/cursor rewrites AND any
    * sibling view's), no-op WITHOUT committing: that's the fixpoint
    * gate, and it must also swallow OTHER views' cursor hops or two
    * quiet views ping-pong hop commits forever (each one's hop is
    * sibling churn to the other). When a NON-MV table did commit,
    * hop the cursor to `to` (state untouched, one metadata-sized
    * commit) so the view never falls behind the vacuum horizon and
    * pays a full O(view) reseed for zero relevant churn — the hop
    * converges because hops themselves touch only `mv_*` tables.
    * (A view defined OVER another view's state table is served by the
    * relevant-churn gate before this branch, never starved by it.)
    */
  private def hopOrNoop(
      spark: SparkSession, db: String, name: String,
      txn: DbLog.Txn, from: Int, to: Int,
      star: Boolean = false): (Int, Int) = {
    import spark.implicits._
    def entries(v: Int) = TxLog.liveEntries(spark, db, v)
      .map(e => (e.name, e.dv)).toSet
    val (pf, pt) = (entries(from), entries(to))
    val touched = ((pf diff pt) ++ (pt diff pf))
      .map(_._1.takeWhile(_ != '/'))
    if (touched.forall(_.startsWith("mv_"))) return (from, from)
    txn.overwrite(cursorTable(name), Seq(to).toDF("version"))
    txn.commit(if (star) s"mv_cursor_star($name)" else s"mv_cursor($name)")
    (from, from)
  }

  /** The definition codec's public face for the SQL surface
    * (`graft_dbmv_star_init`): `"dim:k1+k2;dim2:k3"` — per-dim
    * `table:keys`, keys joined with `+`.
    */
  def parseDims(s: String): Seq[(String, Seq[String])] = decodeDims(s)

  /** Whether `name` names the N-table STAR form (vs the two-table
    * join form) — the SQL refresh/read dispatch probe.
    */
  def isStar(
      spark: SparkSession, db: String, name: String,
      version: Int = Int.MaxValue): Boolean = {
    requireViewName(name)
    DbLog.tables(spark, db, version).contains(sdefTable(name))
  }

  private def joinedStar(
      spark: SparkSession, db: String, v: StarView, version: Int)
      : DataFrame =
    v.dims.foldLeft(DbLog.snapshot(spark, db, v.fact, version)) {
      case (acc, (t, ks)) =>
        acc.join(DbLog.snapshot(spark, db, t, version), ks)
    }.select(v.keep.map(col): _*)

  /** State files sized to the group cardinality — one per ~16k
    * groups ([[MvStore]]'s measured file-overhead balance), power of
    * two, capped.
    */
  private def shardsFor(groups: Long): Int =
    math.min(256L, java.lang.Long.highestOneBit(
      math.max(1L, (groups + (1L << 14) - 1) / (1L << 14)) * 2 - 1)).toInt

  /** Bounded k-smallest / k-largest VALUE collection as aggregates —
    * [[graft.functions.TopKNeighbors]] with a constant id, so the
    * map-side partial keeps an O(k) heap per group and the shuffle
    * never carries a group's full value list (no `collect_list`, no
    * window sort — the 100 TB seed shape).
    */
  private def kSmallest(c: Column, k: Int): Column =
    transform(graft.functions.TopKFunctions
      .topKNeighbors(c, lit(0L), k, scoreAscending = true),
      x => x.getField("score"))
  private def kLargest(c: Column, k: Int): Column =
    transform(graft.functions.TopKFunctions
      .topKNeighbors(c, lit(0L), k, scoreAscending = false),
      x => x.getField("score"))

  /** The per-measure reserve aggregates ([[ExtremeReserve]]) a source
    * scan seeds or rebuilds: ascending min-prefix, descending
    * max-prefix, non-null count.
    */
  private def reserveAggs(v: StarView, prefix: String = ""): Seq[Column] =
    if (v.reserveK <= 0) Nil
    else v.minMaxCols.flatMap(m => Seq(
      kSmallest(col(m).cast("double"), v.reserveK)
        .as(s"${prefix}minres_$m"),
      kLargest(col(m).cast("double"), v.reserveK)
        .as(s"${prefix}maxres_$m"),
      count(col(m)).as(s"${prefix}nn_$m")))

  private def starAgg(joined: DataFrame, v: StarView): DataFrame = {
    val aggs = ((count(lit(1)).as("mv_count") +:
      v.sumCols.map(m => sum(col(m).cast("double")).as(s"sum_$m"))) ++
      v.minMaxCols.flatMap(m => Seq(
        min(col(m).cast("double")).as(s"min_$m"),
        max(col(m).cast("double")).as(s"max_$m")))) ++
      reserveAggs(v)
    joined.groupBy(v.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Register and seed a [[StarView]] — definition, state and cursor
    * land in ONE transaction at one consistent cut. State files are
    * sized to the group cardinality ([[MvStore]]'s one-shard-per-16k-
    * groups balance); later refreshes never rewrite them whole.
    */
  def initStar(
      spark: SparkSession,
      db: String,
      name: String,
      view: StarView): Int = {
    requireViewName(name)
    val have = DbLog.tables(spark, db)
    require(!have.contains(sdefTable(name)) && !have.contains(defTable(name)),
      s"view '$name' already exists in $db")
    import spark.implicits._
    val txn = DbLog.begin(spark, db)
    val seeded = starAgg(
      joinedStar(spark, db, view, txn.baseVersion), view)
      .localCheckpoint()
    val shards = shardsFor(seeded.count())
    txn.append(sdefTable(name),
      Seq((view.fact, encodeDims(view.dims), view.groupCols.mkString(","),
        view.sumCols.mkString(","), view.minMaxCols.mkString(","),
        view.reserveK))
        .toDF("fact", "dims", "group_cols", "sum_cols", "minmax_cols",
          "reserve_k"))
    txn.append(stateTable(name), seeded.repartition(shards))
    txn.append(cursorTable(name), Seq(txn.baseVersion).toDF("version"))
    txn.commit(s"mv_init_star($name)")
  }

  /** The stored star definition at `version` (default current).
    * Pre-reserve definitions (5-column sdef) read back with
    * `reserveK = 0` — their state carries no reserve columns.
    */
  def starDefinition(
      spark: SparkSession, db: String, name: String,
      version: Int = Int.MaxValue): StarView = {
    requireViewName(name)
    val df = DbLog.snapshot(spark, db, sdefTable(name), version)
    val r = df.head()
    def cols(s: String) =
      if (s.isEmpty) Nil else s.split(",").toSeq
    val k =
      if (df.columns.contains("reserve_k")) r.getAs[Int]("reserve_k") else 0
    StarView(r.getString(0), decodeDims(r.getString(1)),
      cols(r.getString(2)), cols(r.getString(3)), cols(r.getString(4)), k)
  }

  /** The star view's rows: `groupCols…, mv_count, sum_…, min_…,
    * max_…` (deletion-vector-applied — hidden old group rows never
    * surface).
    */
  def readStar(
      spark: SparkSession, db: String, name: String,
      version: Int = Int.MaxValue): DataFrame = {
    val df = DbLog.snapshot(spark, db, stateTable(name), version)
    // reserve machinery columns ([[ExtremeReserve]]) are maintenance
    // state, not view output
    df.drop(df.columns.filter(c => c.startsWith("minres_") ||
      c.startsWith("maxres_") || c.startsWith("nn_")): _*)
  }

  /** The OLD-side fact scan for a dim term, bounded two ways by the
    * churn-sized feed's per-key [min, max]: FILE level through the
    * log-carried per-table stats manifests (numeric keys —
    * [[DbLog.candidateTableFiles]], a conjunction across every key
    * that is a fact column) or the footer string manifests (string
    * keys — [[DbLog.candidateTableFilesString]]), then a residual
    * per-key range predicate row-group stats serve inside the
    * survivors. Over-inclusion is harmless — the ⋈ ΔD that follows
    * is exact — so a key no manifest serves simply doesn't prune.
    * An empty delta (or one whose key column is all-NULL — an
    * equi-join key no row can match) reads nothing; a term whose
    * keys are all snowflake columns (produced by an earlier dim,
    * absent on the fact) reads whole.
    */
  private def prunedFactOld(
      spark: SparkSession, db: String, fact: String, from: Int,
      feed: DataFrame, keys: Seq[String]): DataFrame = {
    val whole = DbLog.snapshot(spark, db, fact, from)
    if (feed.isEmpty) return whole.limit(0)
    val factFields = whole.schema.fields.map(f => f.name -> f.dataType).toMap
    val factKeys = keys.filter(factFields.contains)
    if (factKeys.isEmpty) return whole
    // one churn-sized pass over the feed: per-key [min, max]
    val aggs = factKeys.flatMap(k =>
      Seq(min(col(k)).as(s"__lo_$k"), max(col(k)).as(s"__hi_$k")))
    val b = feed.agg(aggs.head, aggs.tail: _*).head()
    def lo(i: Int) = b.get(2 * i)
    def hi(i: Int) = b.get(2 * i + 1)
    if (factKeys.indices.exists(i => b.isNullAt(2 * i)))
      return whole.limit(0)
    val numeric = factKeys.zipWithIndex.collect {
      case (k, i) if lo(i).isInstanceOf[java.lang.Number] =>
        (k, lo(i).asInstanceOf[java.lang.Number].doubleValue,
          hi(i).asInstanceOf[java.lang.Number].doubleValue)
    }
    val strings = factKeys.zipWithIndex.collect {
      case (k, i) if lo(i).isInstanceOf[String] =>
        (k, lo(i).asInstanceOf[String], hi(i).asInstanceOf[String])
    }
    val all = DbLog.candidateTableFiles(spark, db, fact, Nil, from).toSet
    val cand = strings.foldLeft(
      DbLog.candidateTableFiles(spark, db, fact, numeric, from).toSet) {
        case (acc, (k, l, h)) =>
          acc intersect DbLog.candidateTableFilesString(
            spark, db, fact, k, l, h, from).toSet
      }
    val src =
      if (cand == all) whole // nothing pruned: keep the plain-read plan
      else DbLog.snapshotOfFiles(spark, db, fact, cand, from)
    factKeys.zipWithIndex.foldLeft(src) { case (d, (k, i)) =>
      d.filter(col(k) >= lit(lo(i)) && col(k) <= lit(hi(i)))
    }
  }

  /** MAINTENANCE for a star view's merge-on-read state: every refresh
    * hides touched groups behind a deletion vector and appends a
    * small file, so the state table accumulates both — fold the
    * vectors ([[DbLog.materializeTable]]), then pack the smalls
    * ([[DbLog.compactTable]]). Two ordinary table commits; the view's
    * VALUE is untouched (both moves preserve visible rows exactly),
    * and a refresh races them safely (the log's conflict rule — the
    * loser recomputes). Run on whatever cadence the refresh volume
    * suggests; cost is O(state), which is ndv-of-groups sized.
    * Returns (materialize version, compact version), -1 where the
    * step had nothing to do.
    */
  def maintainStar(
      spark: SparkSession, db: String, name: String,
      targetBytes: Long = 128L << 20,
      smallBytes: Long = 64L << 20): (Int, Int) = {
    requireViewName(name)
    val m = DbLog.materializeTable(spark, db, stateTable(name))
    val c = DbLog.compactTable(spark, db, stateTable(name),
      targetBytes, smallBytes)
    (m, c)
  }

  /** Advance the star view to the database's current version: every
    * churned table contributes one telescoping summand (tables left
    * of the delta at the OLD cut, right of it at the NEW — consecutive
    * summands cancel pairwise, so the sum is exactly new − old however
    * many tables churned in one transaction), the per-group signed
    * delta folds into the stored state MERGE-ON-READ (touched groups
    * only), min/max groups hit by any delete re-derive from the NEW
    * joined state pruned to the dirty groups, and state + cursor
    * publish in ONE commit. Returns `(from, to)`; `from == to` means
    * nothing to do. A cursor behind the vacuum horizon reseeds from
    * the current cut.
    */
  def refreshStar(spark: SparkSession, db: String, name: String): (Int, Int) = {
    requireViewName(name)
    import spark.implicits._
    val txn = DbLog.begin(spark, db)
    val to = txn.baseVersion
    val view = starDefinition(spark, db, name, to)
    val from = txn.table(cursorTable(name)).head().getInt(0)
    if (from == to) return (from, to)

    def changed(table: String): Boolean = {
      def ents(v: Int) = TxLog.liveEntries(spark, db, v)
        .filter(_.name.startsWith(table + "/")).map(e => (e.name, e.dv)).toSet
      if (!TxLog.retainedVersions(spark, db).contains(from)) true
      else ents(from) != ents(to)
    }
    val churned = view.tables.map(changed)
    if (!churned.contains(true))
      return hopOrNoop(spark, db, name, txn, from, to, star = true)

    if (!TxLog.retainedVersions(spark, db).contains(from)) {
      // the reseed re-sizes the state layout exactly like initStar —
      // an unpartitioned overwrite would hand every later merge-on-
      // read refresh whatever skew the aggregate's plan ended with
      val seeded = starAgg(joinedStar(spark, db, view, to), view)
        .localCheckpoint()
      txn.overwrite(stateTable(name),
        seeded.repartition(shardsFor(seeded.count())))
      txn.overwrite(cursorTable(name), Seq(to).toDF("version"))
      txn.commit(s"mv_reseed_star($name)")
      return (from, to)
    }

    val keepCt = view.keep :+ "_change_type"
    val feeds: Seq[Option[DataFrame]] = view.tables.zipWithIndex.map {
      case (t, i) =>
        if (!churned(i)) None
        else Some(DbLog.diff(spark, db, t, from, to).localCheckpoint())
    }
    def snapOld(i: Int) =
      DbLog.snapshot(spark, db, view.tables(i), from)
    def snapNew(i: Int) =
      DbLog.snapshot(spark, db, view.tables(i), to)
    val keysFor = view.dims.map(_._2)
    val terms: Seq[DataFrame] = view.tables.indices.flatMap { i =>
      feeds(i).map { fd =>
        if (i == 0)
          // ΔF ⋈ every dim at its NEW cut (churn-sized: broadcast-
          // friendly under AQE)
          view.dims.indices.foldLeft(fd)((acc, j) =>
            acc.join(snapNew(j + 1), keysFor(j)))
            .select(keepCt.map(col): _*)
        else {
          // T₀ᵒˡᵈ…Tᵢ₋₁ᵒˡᵈ ⋈ ΔTᵢ ⋈ Tᵢ₊₁ⁿᵉʷ…Tₙⁿᵉʷ — the fact's old
          // read range-bounded by this dim's changed keys
          val f0 = prunedFactOld(spark, db, view.fact, from, fd,
            keysFor(i - 1))
          val left = (1 until i).foldLeft(f0)((acc, j) =>
            acc.join(snapOld(j), keysFor(j - 1)))
          val mid = left.join(fd, keysFor(i - 1))
          ((i + 1) until view.tables.length).foldLeft(mid)((acc, j) =>
            acc.join(snapNew(j), keysFor(j - 1)))
            .select(keepCt.map(col): _*)
        }
      }
    }
    val u = terms.reduce(_ unionByName _)
    val adds = col("_change_type") === "insert"
    val gcols = view.groupCols.map(col)
    val k = view.reserveK
    val baseAggs = sum(when(adds, 1L).otherwise(-1L)).as("d_n") +:
      view.sumCols.map(m => sum(when(adds, col(m).cast("double"))
        .otherwise(-col(m).cast("double"))).as(s"d_$m"))
    val mmAggsD: Seq[Column] =
      if (k > 0)
        // reserve feeds: per measure, the bounded add/delete extreme
        // arrays ([[ExtremeReserve]]) + the signed non-null count —
        // O(k) per group on the map side, never a full value list
        view.minMaxCols.flatMap(m => Seq(
          kSmallest(when(adds, col(m).cast("double")), k)
            .as(s"addmin_$m"),
          kLargest(when(adds, col(m).cast("double")), k)
            .as(s"addmax_$m"),
          kSmallest(when(!adds, col(m).cast("double")), k + 1)
            .as(s"delmin_$m"),
          kLargest(when(!adds, col(m).cast("double")), k + 1)
            .as(s"delmax_$m"),
          sum(when(col(m).cast("double").isNotNull,
            when(adds, 1L).otherwise(-1L)).otherwise(0L))
            .as(s"d_nn_$m")))
      else
        view.minMaxCols.flatMap(m => Seq(
          min(when(adds, col(m).cast("double"))).as(s"add_min_$m"),
          max(when(adds, col(m).cast("double"))).as(s"add_max_$m")))
    val aggs = (baseAggs ++ mmAggsD) :+
      max(when(!adds, lit(1)).otherwise(lit(0))).as("__dirty")
    val delta = u.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
      .localCheckpoint() // probed (dirty), keyed and merged below
    // every group-key join below is NULL-SAFE
    // ([[RelationalOps.nullSafeMerge]]): a NULL dim attribute names a
    // real group, and null-never-equals joins would append a
    // duplicate null-group state row per refresh
    val stored = RelationalOps.nullSafeSemi(
      txn.table(stateTable(name)), delta, view.groupCols)
    // full-outer with coalesced group keys: the USING form would emit
    // null-group rows from BOTH sides unpaired
    val base = RelationalOps.nullSafeMerge(stored, delta, view.groupCols)
    // WITHOUT reserves a group is dirty whenever any delete touched
    // it (a removal can invalidate a stored extreme); WITH them only
    // a DRAINED prefix forces the source recompute — the dirtiness is
    // decided per group by the reserve algebra, post-merge
    val (preRc, dirtyCol) =
      if (k <= 0 || view.minMaxCols.isEmpty) (base, col("__dirty") === 1)
      else {
        val resUdf = udf((minres: Seq[Double], maxres: Seq[Double],
            nn: Long, delMin: Seq[Double], addMin: Seq[Double],
            delMax: Seq[Double], addMax: Seq[Double], dNn: Long) =>
          ExtremeReserve(minres, maxres, nn, delMin, addMin,
            delMax, addMax, dNn, k))
        def arr(c: String) =
          coalesce(col(c), array().cast("array<double>"))
        val withRes = view.minMaxCols.foldLeft(base)((d, m) =>
          d.withColumn(s"__res_$m", resUdf(
            arr(s"minres_$m"), arr(s"maxres_$m"),
            coalesce(col(s"nn_$m"), lit(0L)),
            arr(s"delmin_$m"), arr(s"addmin_$m"),
            arr(s"delmax_$m"), arr(s"addmax_$m"),
            coalesce(col(s"d_nn_$m"), lit(0L)))))
        (withRes.withColumn("__rdirty",
          view.minMaxCols.map(m => col(s"__res_$m").getField("dirty"))
            .reduce(_ || _)).localCheckpoint(),
          col("__rdirty"))
      }
    val recomputed =
      if (view.minMaxCols.isEmpty) preRc
      else {
        val dirty = preRc.filter(dirtyCol)
          .select(gcols: _*).localCheckpoint()
        if (dirty.isEmpty)
          view.minMaxCols.foldLeft(preRc)((d, m) => {
            val d2 = d
              .withColumn(s"rc_min_$m", lit(null).cast("double"))
              .withColumn(s"rc_max_$m", lit(null).cast("double"))
            if (k <= 0) d2
            else d2
              .withColumn(s"rc_minres_$m",
                lit(null).cast("array<double>"))
              .withColumn(s"rc_maxres_$m",
                lit(null).cast("array<double>"))
              .withColumn(s"rc_nn_$m", lit(null).cast("long"))
          })
        else {
          val mmAggs = view.minMaxCols.flatMap(m => Seq(
            min(col(m).cast("double")).as(s"rc_min_$m"),
            max(col(m).cast("double")).as(s"rc_max_$m"))) ++
            reserveAggs(view, "rc_")
          val recomp = RelationalOps.nullSafeSemi(
              joinedStar(spark, db, view, to), dirty, view.groupCols)
            .groupBy(gcols: _*).agg(mmAggs.head, mmAggs.tail: _*)
          RelationalOps.nullSafeMerge(preRc, recomp, view.groupCols, "left")
        }
      }
    val mmOut = view.minMaxCols.flatMap(m =>
      if (k > 0) Seq(
        when(dirtyCol, col(s"rc_min_$m"))
          .otherwise(get(col(s"__res_$m").getField("minres"), lit(0)))
          .as(s"min_$m"),
        when(dirtyCol, col(s"rc_max_$m"))
          .otherwise(get(col(s"__res_$m").getField("maxres"), lit(0)))
          .as(s"max_$m"),
        when(dirtyCol, col(s"rc_minres_$m"))
          .otherwise(col(s"__res_$m").getField("minres"))
          .as(s"minres_$m"),
        when(dirtyCol, col(s"rc_maxres_$m"))
          .otherwise(col(s"__res_$m").getField("maxres"))
          .as(s"maxres_$m"),
        when(dirtyCol, col(s"rc_nn_$m"))
          .otherwise(col(s"__res_$m").getField("nn")).as(s"nn_$m"))
      else Seq(
        when(dirtyCol, col(s"rc_min_$m"))
          .otherwise(least(col(s"min_$m"), col(s"add_min_$m")))
          .as(s"min_$m"),
        when(dirtyCol, col(s"rc_max_$m"))
          .otherwise(greatest(col(s"max_$m"), col(s"add_max_$m")))
          .as(s"max_$m")))
    val merged = recomputed
      .select(((gcols :+
        (coalesce(col("mv_count"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("mv_count")) ++
        view.sumCols.map(m =>
          (coalesce(col(s"sum_$m"), lit(0.0)) +
            coalesce(col(s"d_$m"), lit(0.0))).as(s"sum_$m")) ++ mmOut): _*)
      .localCheckpoint()
    txn.applyKeyed(stateTable(name), view.groupCols,
      upserts = merged.filter(col("mv_count") > 0L),
      deleteKeys = merged.filter(col("mv_count") <= 0L)
        .select(gcols: _*),
      nullSafeKeys = true)
    txn.overwrite(cursorTable(name), Seq(to).toDF("version"))
    txn.commit(s"mv_refresh_star($name)")
    (from, to)
  }
}
