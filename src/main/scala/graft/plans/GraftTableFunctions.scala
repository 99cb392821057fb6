package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.ops.TxLog

/** SQL TABLE functions over the transaction log — the lakehouse
  * surface reachable from plain `spark.sql`:
  *
  * {{{
  * SELECT * FROM graft_snapshot('/data/orders')        -- current
  * SELECT * FROM graft_snapshot('/data/orders', 3)     -- time travel
  * SELECT * FROM graft_history('/data/orders')         -- DESCRIBE HISTORY
  * SELECT * FROM graft_diff('/data/orders', 1, 4)      -- change feed
  * SELECT * FROM graft_scan('/data/orders', 'k', 10, 99) -- stats-pruned
  * SELECT * FROM graft_hidden_range('/data/ev', 'ts',    -- hidden-partition
  *   '2024-01-10 00:00:00', '2024-01-12 23:59:59')       --   range scan
  * SELECT * FROM graft_hidden_eq('/data/ev', 'user_id', 1, 2) -- bucket scan
  * SELECT * FROM graft_files('/data/orders')   -- files table (DESCRIBE DETAIL)
  * SELECT * FROM graft_db('/data/db', 'orders')     -- DbLog database table
  * SELECT * FROM graft_db('/data/db', 'orders', 3)  --   at a database version
  * SELECT * FROM graft_optimize('/data/orders')     -- PROCEDURES: run the
  * SELECT * FROM graft_vacuum('/data/orders', 30)   --   maintenance action,
  * SELECT * FROM graft_restore('/data/orders', 3)   --   return its receipt
  * SELECT * FROM graft_tag('/data/orders', 'audit-q3')
  * SELECT * FROM graft_snapshot('/data/orders', 'audit-q3')  -- read by tag
  * }}}
  *
  * Two registration paths, same builders:
  *  - a session built with `spark.sql.extensions=graft.GraftExtensions`
  *    registers the TVFs via `injectTableFunction`; the builder has no
  *    session yet, so it emits an unresolved [[GraftTableRef]] leaf
  *    that the injected resolution [[ResolveGraftTableRef]] rule (which
  *    DOES get the session) swaps for the analyzed snapshot plan — the
  *    standard custom-LogicalPlan + Rule composition;
  *  - `GraftExtensions.installInto(spark)` on an existing session
  *    registers builders that close over the session and resolve
  *    immediately (an analyzer already running can't grow new rules).
  *
  * Arguments must be literals (a table function's location can't be
  * row-dependent); evaluation happens once at planning.
  */
object GraftTableFunctions {

  /** Unresolved placeholder emitted by the extensions-config path;
    * [[ResolveGraftTableRef]] replaces it during analysis.
    */
  final case class GraftTableRef(fn: String, args: Seq[Expression])
      extends LeafNode {
    override def output: Seq[Attribute] = Nil
    override lazy val resolved: Boolean = false
  }

  final class ResolveGraftTableRef(spark: SparkSession)
      extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsUp {
        case GraftTableRef(fn, args) =>
          org.apache.spark.sql.GraftShim.analyzedPlan(build(spark, fn, args))
      }
  }

  private def str(e: Expression, fn: String, pos: Int): String = e match {
    case lit if lit.foldable =>
      val v = lit.eval()
      require(v != null, s"$fn: argument ${pos + 1} must not be NULL")
      v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a literal, got $other")
  }

  /** A comma-separated column list argument; empty string = Nil. */
  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def int(e: Expression, fn: String, pos: Int): Int = e match {
    case lit if lit.foldable => lit.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an integer literal, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  /** DESCRIBE-style schema table: one row per pinned column at
    * `version` with its type, nullability, PHYSICAL name (column
    * mapping), generation expression, identity declaration and
    * partition membership — the observability surface for every
    * round of schema evolution in one place.
    */
  private def schemaMeta(
      spark: SparkSession, dir: String, version: Int): DataFrame = {
    import spark.implicits._
    val pin = TxLog.tableSchema(spark, dir, version)
      .getOrElse(TxLog.snapshot(spark, dir, version).schema)
    val gens = graft.ops.GeneratedColumns.spec(spark, dir).toMap
    val ident = graft.ops.IdentityColumns.spec(spark, dir)
    val pcols = TxLog.partitionColumns(spark, dir).toSet
    pin.fields.toSeq.map { f =>
      (f.name, f.dataType.simpleString, f.nullable,
        graft.ops.ColumnMapping.physicalName(f),
        gens.get(f.name).orNull,
        ident.collect { case (c, st, sp) if c == f.name =>
          s"START $st STEP $sp" }.headOption.orNull,
        pcols(f.name))
    }.toDF("column", "type", "nullable", "physical", "generated_as",
      "identity", "partition")
  }

  private[graft] def build(
      spark: SparkSession,
      fn: String,
      args: Seq[Expression]): DataFrame = (fn, args) match {
    case ("graft_snapshot", Seq(d)) =>
      TxLog.read(spark, str(d, fn, 0))
    case ("graft_snapshot", Seq(d, v))
        if v.foldable && v.dataType ==
          org.apache.spark.sql.types.StringType =>
      TxLog.snapshotTag(spark, str(d, fn, 0), str(v, fn, 1))
    // TIMESTAMP AS OF: graft_snapshot(dir, TIMESTAMP '2026-01-01 ...')
    case ("graft_snapshot", Seq(d, v))
        if v.foldable && v.dataType ==
          org.apache.spark.sql.types.TimestampType =>
      anyLit(v, fn, 1) match {
        case ts: java.sql.Timestamp =>
          TxLog.snapshotAsOf(spark, str(d, fn, 0), ts.getTime)
        case other => throw new IllegalArgumentException(
          s"$fn: unsupported timestamp literal $other")
      }
    case ("graft_snapshot", Seq(d, v)) =>
      TxLog.snapshot(spark, str(d, fn, 0), int(v, fn, 1))
    case ("graft_history", Seq(d)) =>
      TxLog.history(spark, str(d, fn, 0))
    case ("graft_diff", Seq(d, a, b)) =>
      // version numbers or tag names, mixed freely: the audit diff
      // between two releases is graft_diff(dir, 'v1.0', 'v1.1')
      val dir = str(d, fn, 0)
      def ver(e: Expression, pos: Int): Int =
        if (e.dataType == org.apache.spark.sql.types.StringType) {
          val name = str(e, fn, pos)
          TxLog.tags(spark, dir).getOrElse(name,
            throw new IllegalArgumentException(s"$fn: no tag '$name' in $dir"))
        } else int(e, fn, pos)
      TxLog.diff(spark, dir, ver(a, 1), ver(b, 2))
    case ("graft_scan", Seq(d, c, lo, hi)) =>
      TxLog.snapshotPruned(spark, str(d, fn, 0), str(c, fn, 1),
        dbl(lo, fn, 2), dbl(hi, fn, 3))
    case ("graft_files", Seq(d)) =>
      TxLog.filesMeta(spark, str(d, fn, 0))
    case ("graft_files", Seq(d, v)) =>
      TxLog.filesMeta(spark, str(d, fn, 0), int(v, fn, 1))
    case ("graft_schema", Seq(d)) =>
      schemaMeta(spark, str(d, fn, 0), Int.MaxValue)
    case ("graft_schema", Seq(d, v)) =>
      schemaMeta(spark, str(d, fn, 0), int(v, fn, 1))
    case ("graft_db", Seq(d, tbl)) =>
      graft.ops.DbLog.snapshot(spark, str(d, fn, 0), str(tbl, fn, 1))
    case ("graft_db", Seq(d, tbl, v))
        if v.dataType == org.apache.spark.sql.types.TimestampType =>
      // TIMESTAMP AS OF for one table of a DbLog database — the
      // database log's in-commit stamps resolve the version, so the
      // cut is consistent across every table of the same database
      val db = str(d, fn, 0)
      val at = anyLit(v, fn, 2) match {
        case ts: java.sql.Timestamp =>
          TxLog.versionAsOf(spark, db, ts.getTime)
        case other => throw new IllegalArgumentException(
          s"$fn: unsupported timestamp literal $other")
      }
      graft.ops.DbLog.snapshot(spark, db, str(tbl, fn, 1), at)
    case ("graft_db", Seq(d, tbl, v)) =>
      graft.ops.DbLog.snapshot(spark, str(d, fn, 0), str(tbl, fn, 1),
        int(v, fn, 2))
    case ("graft_hidden_range", Seq(d, c, lo, hi)) =>
      graft.ops.PartitionTransforms.scanRange(spark, str(d, fn, 0),
        str(c, fn, 1), anyLit(lo, fn, 2), anyLit(hi, fn, 3))
    case ("graft_hidden_eq", Seq(d, c, vs @ _*)) if vs.nonEmpty =>
      graft.ops.PartitionTransforms.scanEquals(spark, str(d, fn, 0),
        str(c, fn, 1), vs.zipWithIndex.map { case (v, i) =>
          anyLit(v, fn, i + 2) })
    // ---- procedures (Iceberg CALL-style): the SELECT runs the
    // maintenance action once at planning and returns its receipt —
    // the SQL-only operator's path to OPTIMIZE/VACUUM/RESTORE/tags
    case ("graft_optimize", Seq(d)) =>
      optimizeReceipt(spark, str(d, fn, 0), Nil)
    case ("graft_optimize", Seq(d, z)) =>
      optimizeReceipt(spark, str(d, fn, 0),
        str(z, fn, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    case ("graft_vacuum", Seq(d, r)) =>
      val dir = str(d, fn, 0)
      val reclaimed = TxLog.vacuum(spark, dir, int(r, fn, 1))
      procReceipt(spark, "vacuum", dir, Seq(
        "files_reclaimed" -> reclaimed,
        "version" -> TxLog.currentVersion(spark, dir).toLong))
    case ("graft_checkpoint", Seq(d)) =>
      val dir = str(d, fn, 0)
      val at = TxLog.checkpoint(spark, dir)
      procReceipt(spark, "checkpoint", dir, Seq("version" -> at.toLong))
    case ("graft_restore", Seq(d, v))
        if v.foldable && v.dataType ==
          org.apache.spark.sql.types.StringType =>
      // restore by TAG name — roll back to the audited release
      val dir = str(d, fn, 0)
      val name = str(v, fn, 1)
      val tagged = TxLog.tags(spark, dir).getOrElse(name,
        throw new IllegalArgumentException(s"graft_restore: no tag '$name'"))
      val nv = TxLog.restore(spark, dir, tagged)
      procReceipt(spark, "restore", dir, Seq("version" -> nv.toLong))
    case ("graft_restore", Seq(d, v)) =>
      val dir = str(d, fn, 0)
      val nv = TxLog.restore(spark, dir, int(v, fn, 1))
      procReceipt(spark, "restore", dir, Seq("version" -> nv.toLong))
    case ("graft_vacuum_dry_run", Seq(d, r)) =>
      val dir = str(d, fn, 0)
      val would = TxLog.vacuum(spark, dir, int(r, fn, 1), dryRun = true)
      procReceipt(spark, "vacuum-dry-run", dir, Seq(
        "files_reclaimed" -> would,
        "version" -> TxLog.currentVersion(spark, dir).toLong))
    case ("graft_evolve_partitioning", Seq(d, s)) =>
      val dir = str(d, fn, 0)
      graft.ops.PartitionTransforms.evolve(spark, dir,
        str(s, fn, 1).split(",").map(_.trim).filter(_.nonEmpty)
          .map(graft.ops.PartitionTransforms.parseTransform).toSeq)
      procReceipt(spark, "evolve-partitioning", dir, Seq(
        "version" -> TxLog.currentVersion(spark, dir).toLong))
    case ("graft_export_manifest", Seq(d)) =>
      val dir = str(d, fn, 0)
      val n = graft.ops.SnapshotExport.symlinkManifest(spark, dir)
      procReceipt(spark, "export-manifest", dir, Seq(
        "files_listed" -> n,
        "version" -> TxLog.currentVersion(spark, dir).toLong))
    case ("graft_export_manifest", Seq(d, v)) =>
      val dir = str(d, fn, 0)
      val n = graft.ops.SnapshotExport.symlinkManifest(spark, dir,
        int(v, fn, 1))
      procReceipt(spark, "export-manifest", dir, Seq(
        "files_listed" -> n, "version" -> int(v, fn, 1).toLong))
    // COPY INTO: idempotent ledger-tracked file ingestion — re-runs
    // load nothing twice ([[graft.ops.CopyInto]])
    case ("graft_copy_into", rest @ Seq(d, s0, f0, _*))
        if rest.length <= 5 =>
      val dir = str(d, fn, 0)
      val pat = if (rest.length >= 4) str(rest(3), fn, 3) else "*"
      // 5th arg: comma-joined flags — 'force' (re-load everything),
      // 'evolve' (parquet batch columns widen the table)
      val flags = if (rest.length == 5)
        str(rest(4), fn, 4).split(",").map(_.trim.toLowerCase)
          .filter(_.nonEmpty).toSet
      else Set.empty[String]
      val bad = flags -- Set("force", "evolve")
      require(bad.isEmpty, s"$fn: unknown flags ${bad.mkString(",")}")
      val r = graft.ops.CopyInto.copyInto(spark, dir, str(s0, fn, 1),
        str(f0, fn, 2), pattern = pat,
        force = flags("force"), evolveSchema = flags("evolve"))
      procReceipt(spark, "copy-into", dir, Seq(
        "files_loaded" -> r.filesLoaded.toLong,
        "rows_loaded" -> r.rowsLoaded,
        "files_skipped" -> r.filesSkipped.toLong,
        "version" -> r.version.toLong))
    case ("graft_detail", Seq(d)) =>
      // DESCRIBE DETAIL: the one-row operational summary a policy or
      // a human reads first — metadata + one fs status per live file
      val dir = str(d, fn, 0)
      val entries = TxLog.liveEntries(spark, dir)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytes = entries.map { e =>
        // based (shallow-clone) entries' bytes live under the source
        // root — counted here because the SNAPSHOT reads them, even
        // though the clone's own vacuum would not sweep them
        try fs.getFileStatus(new org.apache.hadoop.fs.Path(
          e.base.getOrElse(dir), e.name)).getLen
        catch { case _: java.io.IOException => 0L }
      }.foldLeft(0L)(_ + _)
      val v = TxLog.currentVersion(spark, dir)
      val pin = TxLog.tableSchema(spark, dir)
      import spark.implicits._
      Seq((dir, v,
        new java.sql.Timestamp(TxLog.commitTimeMillis(spark, dir, v)),
        entries.size.toLong, bytes,
        TxLog.partitionColumns(spark, dir).mkString(","),
        (try graft.ops.PartitionTransforms.spec(spark, dir)
          .map(_.serialized)
        catch { case _: IllegalArgumentException => Nil }).mkString(","),
        TxLog.clusterColumns(spark, dir).mkString(","),
        TxLog.statsColumns(spark, dir).mkString(","),
        graft.ops.IdentityColumns.spec(spark, dir)
          .map(_._1).getOrElse(""),
        graft.ops.RowTracking.enabled(spark, dir),
        pin.exists(graft.ops.ColumnMapping.isMapped),
        TxLog.tags(spark, dir).size.toLong,
        TxLog.branches(spark, dir).size.toLong,
        TxLog.cloneSource(spark, dir).map(_._1).getOrElse("")))
        .toDF("location", "version", "committed_at", "n_files",
          "size_bytes", "partition_columns", "hidden_partitioning",
          "cluster_columns", "stats_columns", "identity_column",
          "row_tracking", "column_mapping", "n_tags", "n_branches",
          "clone_source")
    case ("graft_checkpoint_every", Seq(d, n)) =>
      // auto-checkpoint policy: every N-th commit folds the log
      // in-line (0 clears) — Delta's checkpointInterval as a property
      val dir = str(d, fn, 0)
      val every = int(n, fn, 1)
      TxLog.setCheckpointEvery(spark, dir, every)
      procReceipt(spark,
        if (every == 0) "checkpoint-every-cleared"
        else s"checkpoint-every($every)", dir, Seq(
        "version" -> TxLog.currentVersion(spark, dir).toLong))
    case ("graft_cluster_by", Seq(d, c)) =>
      // liquid-style CLUSTER BY: declare once; every later OPTIMIZE /
      // compactEvery pass clusters the unclustered tail on these
      val dir = str(d, fn, 0)
      val cols = str(c, fn, 1).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      TxLog.setClusterColumns(spark, dir, cols)
      procReceipt(spark, s"cluster-by(${cols.mkString(",")})", dir, Seq(
        "n_cols" -> cols.size.toLong,
        "version" -> TxLog.currentVersion(spark, dir).toLong))
    case ("graft_ingested", Seq(d)) =>
      import spark.implicits._
      graft.ops.CopyInto.ingestedFiles(spark, str(d, fn, 0))
        .toDF("source_file")
    case ("graft_rowids", Seq(d)) =>
      graft.ops.RowTracking.read(spark, str(d, fn, 0))
    case ("graft_enable_rowtracking", Seq(d)) =>
      val dir = str(d, fn, 0)
      graft.ops.RowTracking.enable(spark, dir)
      procReceipt(spark, "enable-rowtracking", dir, Seq(
        "entries" -> TxLog.liveEntries(spark, dir).size.toLong,
        "version" -> TxLog.currentVersion(spark, dir).toLong))
    case ("graft_db_rename_column", Seq(d, tb, f0, t1)) =>
      val db = str(d, fn, 0)
      val v = graft.ops.DbLog.renameColumn(spark, db,
        str(tb, fn, 1), str(f0, fn, 2), str(t1, fn, 3))
      procReceipt(spark, "db-rename-column", db, Seq(
        "version" -> v.toLong))
    case ("graft_replicate", Seq(s0, d0, k0)) =>
      val src = str(s0, fn, 0)
      val (from, to) = TxLog.replicateTo(spark, src,
        str(d0, fn, 1), str(k0, fn, 2))
      procReceipt(spark, "replicate", src, Seq(
        "from_version" -> from.toLong, "to_version" -> to.toLong))
    case ("graft_replicate_rowid", Seq(s0, d0)) =>
      val src = str(s0, fn, 0)
      val (from, to) = TxLog.replicateByRowId(spark, src, str(d0, fn, 1))
      procReceipt(spark, "replicate-rowid", src, Seq(
        "from_version" -> from.toLong, "to_version" -> to.toLong))
    case ("graft_db_widen_column", Seq(d, tb, c0, t1)) =>
      val db = str(d, fn, 0)
      val v = graft.ops.DbLog.alterColumnType(spark, db,
        str(tb, fn, 1), str(c0, fn, 2),
        org.apache.spark.sql.types.DataType.fromDDL(str(t1, fn, 3)))
      procReceipt(spark, "db-widen-column", db, Seq(
        "version" -> v.toLong))
    case ("graft_changes", Seq(d, f, t0)) =>
      // keyless 3-arg form: a row-tracked table pairs update images by
      // its stable _row_id — no key list to get wrong
      val dir = str(d, fn, 0)
      TxLog.changes(spark, dir, cdcBound(spark, dir, fn, f, 1),
        cdcBound(spark, dir, fn, t0, 2), Nil)
    case ("graft_changes", Seq(d, f, t0, k)) =>
      // version numbers, tag names, or TIMESTAMP literals, mixed
      // freely — the audit CDF between two releases is
      // graft_changes(dir, 'v1.0', 'v1.1', 'id'); between two clock
      // times, graft_changes(dir, TIMESTAMP 'a', TIMESTAMP 'b', 'id')
      val dir = str(d, fn, 0)
      TxLog.changes(spark, dir, cdcBound(spark, dir, fn, f, 1),
        cdcBound(spark, dir, fn, t0, 2),
        str(k, fn, 3).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    case ("graft_db_changes", Seq(d, tb, f, t0, k)) =>
      graft.ops.DbLog.changes(spark, str(d, fn, 0), str(tb, fn, 1),
        int(f, fn, 2), int(t0, fn, 3),
        str(k, fn, 4).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    case ("graft_db_changes", Seq(d, tb, f, t0)) =>
      // keyless 4-arg form: a per-table row-tracked database table
      // pairs update images by its stable _row_id
      graft.ops.DbLog.changes(spark, str(d, fn, 0), str(tb, fn, 1),
        int(f, fn, 2), int(t0, fn, 3), Nil)
    case ("graft_db_rowids", Seq(d, tb)) =>
      graft.ops.RowTracking.readTable(spark, str(d, fn, 0), str(tb, fn, 1))
    case ("graft_db_enable_rowtracking", Seq(d, tb)) =>
      val db = str(d, fn, 0)
      val table = str(tb, fn, 1)
      graft.ops.RowTracking.enableTable(spark, db, table)
      procReceipt(spark, s"db-enable-rowtracking($table)", db, Seq(
        "version" -> TxLog.currentVersion(spark, db).toLong))
    case ("graft_db_replicate_rowid", Seq(d, tb, d0)) =>
      val db = str(d, fn, 0)
      val (from, to) = graft.ops.DbLog.replicateTableByRowId(spark, db,
        str(tb, fn, 1), str(d0, fn, 2))
      procReceipt(spark, "db-replicate-rowid", db, Seq(
        "from_version" -> from.toLong, "to_version" -> to.toLong))
    case ("graft_db_compact", Seq(d, tb)) =>
      val db = str(d, fn, 0)
      val v = graft.ops.DbLog.compactTable(spark, db, str(tb, fn, 1))
      procReceipt(spark, "db-compact", db, Seq("version" -> v.toLong))
    case ("graft_db_materialize", Seq(d, tb)) =>
      val db = str(d, fn, 0)
      val v = graft.ops.DbLog.materializeTable(spark, db, str(tb, fn, 1))
      procReceipt(spark, "db-materialize", db, Seq("version" -> v.toLong))
    case ("graft_dbmv_init", Seq(d, n, f0, dm, fk, dk, g, s0)) =>
      val db = str(d, fn, 0)
      val name = str(n, fn, 1)
      val v = graft.ops.DbMv.init(spark, db, name,
        graft.ops.DbMv.JoinView(str(f0, fn, 2), str(dm, fn, 3),
          str(fk, fn, 4), str(dk, fn, 5), csv(str(g, fn, 6)),
          str(s0, fn, 7)))
      procReceipt(spark, s"dbmv-init($name)", db, Seq("version" -> v.toLong))
    case ("graft_dbmv_star_init", rest @ Seq(d, n, f0, dm, g, s0, _*))
        if rest.length <= 8 =>
      val db = str(d, fn, 0)
      val name = str(n, fn, 1)
      val mm = rest.lift(6).map(e => csv(str(e, fn, 6))).getOrElse(Nil)
      val rk = rest.lift(7).map(int(_, fn, 7)).getOrElse(0)
      val v = graft.ops.DbMv.initStar(spark, db, name,
        graft.ops.DbMv.StarView(str(f0, fn, 2),
          graft.ops.DbMv.parseDims(str(dm, fn, 3)),
          csv(str(g, fn, 4)), csv(str(s0, fn, 5)), mm, rk))
      procReceipt(spark, s"dbmv-star-init($name)", db,
        Seq("version" -> v.toLong))
    case ("graft_dbmv_refresh", Seq(d, n)) =>
      // one verb for both forms: the stored definition says which
      val db = str(d, fn, 0)
      val name = str(n, fn, 1)
      val (from, to) =
        if (graft.ops.DbMv.isStar(spark, db, name))
          graft.ops.DbMv.refreshStar(spark, db, name)
        else graft.ops.DbMv.refresh(spark, db, name)
      procReceipt(spark, s"dbmv-refresh($name)", db, Seq(
        "from_version" -> from.toLong, "to_version" -> to.toLong))
    case ("graft_dbmv_read", rest @ Seq(d, n, _*)) if rest.length <= 3 =>
      val db = str(d, fn, 0)
      val name = str(n, fn, 1)
      val v = rest.lift(2).map(int(_, fn, 2)).getOrElse(Int.MaxValue)
      if (graft.ops.DbMv.isStar(spark, db, name, v))
        graft.ops.DbMv.readStar(spark, db, name, v)
      else graft.ops.DbMv.read(spark, db, name, v)
    case ("graft_mv_follow", Seq(s0, n, src, g, m)) =>
      val storeDir = str(s0, fn, 0)
      val name = str(n, fn, 1)
      val (from, to) = graft.ops.MvStore.followTxLog(
        new graft.sources.ParquetStore(spark, storeDir), name,
        str(src, fn, 2), csv(str(g, fn, 3)), csv(str(m, fn, 4)))
      procReceipt(spark, s"mv-follow($name)", storeDir, Seq(
        "from_version" -> from.toLong, "to_version" -> to.toLong))
    case ("graft_mv_read", Seq(s0, n)) =>
      graft.ops.MvStore.read(
        new graft.sources.ParquetStore(spark, str(s0, fn, 0)),
        str(n, fn, 1))
    case ("graft_joinmv_follow", rest @ Seq(s0, n, f0, dm, g, m, _*))
        if rest.length <= 7 =>
      // dims spell `dir:k1+k2;dir2:k3` — the split takes the LAST
      // colon of each part, so scheme-qualified dirs (file:/x,
      // s3://b/p) pass through; join keys must not contain ':'
      val storeDir = str(s0, fn, 0)
      val name = str(n, fn, 1)
      val dims = str(dm, fn, 3).split(";").toSeq.map { part =>
        val cut = part.lastIndexOf(':')
        require(cut > 0, s"$fn: malformed dim '$part' (want dir:k1+k2)")
        (part.substring(0, cut),
          part.substring(cut + 1).split("\\+").toSeq)
      }
      val mm = rest.lift(6).map(e => csv(str(e, fn, 6))).getOrElse(Nil)
      val rs = graft.ops.JoinMv.followStar(
        new graft.sources.ParquetStore(spark, storeDir), name,
        str(f0, fn, 2), dims, csv(str(g, fn, 4)), csv(str(m, fn, 5)), mm)
      import spark.implicits._
      (str(f0, fn, 2) +: dims.map(_._1)).zip(rs).zipWithIndex
        .map { case ((t, (from, to)), i) => (i, t, from, to) }
        .toDF("idx", "table", "from_version", "to_version")
    case ("graft_clone", rest @ Seq(s0, d0, _*)) if rest.length <= 4 =>
      val src = str(s0, fn, 0)
      val dst = str(d0, fn, 1)
      // 3rd arg: a version number OR a source tag name; 4th: 'pin'
      // tags the cloned version on the source so vacuum keeps it
      val srcV = rest.lift(2).map { e =>
        if (e.dataType == org.apache.spark.sql.types.StringType) {
          val name = str(e, fn, 2)
          TxLog.tags(spark, src).getOrElse(name,
            throw new IllegalArgumentException(s"graft_clone: no tag '$name'"))
        } else int(e, fn, 2)
      }.getOrElse(Int.MaxValue)
      val pin = rest.lift(3).exists(e => str(e, fn, 3) == "pin")
      val v = TxLog.cloneTo(spark, src, dst, srcV, pinSource = pin)
      procReceipt(spark, "clone", dst, Seq(
        "version" -> v.toLong,
        "entries" -> TxLog.liveEntries(spark, dst).size.toLong))
    case ("graft_localize", Seq(d)) =>
      val dir = str(d, fn, 0)
      val r = TxLog.localize(spark, dir)
      procReceipt(spark, "localize", dir, Seq(
        "localized" -> r.localized, "bytes_copied" -> r.bytesCopied,
        "written" -> r.written, "already_local" -> r.alreadyLocal))
    case ("graft_clone_source", Seq(d)) =>
      import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
      val dir = str(d, fn, 0)
      val rows = TxLog.cloneSource(spark, dir).toSeq
        .map { case (s, v) => org.apache.spark.sql.Row(s, v) }
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        StructType(Seq(
          StructField("source", StringType, nullable = false),
          StructField("source_version", IntegerType, nullable = false))))
    case ("graft_tag", Seq(d, n)) =>
      val dir = str(d, fn, 0)
      val v = TxLog.setTag(spark, dir, str(n, fn, 1))
      procReceipt(spark, "tag", dir, Seq("version" -> v.toLong))
    case ("graft_tag", Seq(d, n, v)) =>
      val dir = str(d, fn, 0)
      val pinned = TxLog.setTag(spark, dir, str(n, fn, 1), int(v, fn, 2))
      procReceipt(spark, "tag", dir, Seq("version" -> pinned.toLong))
    // ---- branches (write-audit-publish): the branch READ is what an
    // audit query runs against before graft_publish lands the changes
    case ("graft_branch", Seq(d, n)) =>
      val dir = str(d, fn, 0)
      TxLog.withBranch(spark, dir, str(n, fn, 1))(
        // force the plan INSIDE the scope: the fold over branch
        // version files happens at planning, so the returned frame
        // stays correct after the scope closes
        TxLog.snapshot(spark, dir))
    case ("graft_tags", Seq(d)) =>
      import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
      val dir = str(d, fn, 0)
      val rows = TxLog.tags(spark, dir).toSeq.sortBy(_._1)
        .map { case (n, v) => org.apache.spark.sql.Row(n, v) }
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        StructType(Seq(StructField("tag", StringType, nullable = false),
          StructField("version", IntegerType, nullable = false))))
    case ("graft_branches", Seq(d)) =>
      import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
      val dir = str(d, fn, 0)
      val rows = TxLog.branches(spark, dir).toSeq.sortBy(_._1)
        .map { case (n, b) => org.apache.spark.sql.Row(n, b) }
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        StructType(Seq(StructField("branch", StringType, nullable = false),
          StructField("base_version", IntegerType, nullable = false))))
    case ("graft_create_branch", Seq(d, n)) =>
      val dir = str(d, fn, 0)
      val base = TxLog.createBranch(spark, dir, str(n, fn, 1))
      procReceipt(spark, "create-branch", dir, Seq("version" -> base.toLong))
    case ("graft_create_branch", Seq(d, n, v)) =>
      val dir = str(d, fn, 0)
      val base = TxLog.createBranch(spark, dir, str(n, fn, 1), int(v, fn, 2))
      procReceipt(spark, "create-branch", dir, Seq("version" -> base.toLong))
    case ("graft_publish_preview", Seq(d, n)) =>
      val dir = str(d, fn, 0)
      val (adds, removes, conflicted) =
        TxLog.publishPreview(spark, dir, str(n, fn, 1))
      procReceipt(spark, "publish-preview", dir, Seq(
        "n_adds" -> adds.toLong, "n_removes" -> removes.toLong,
        "n_conflicts" -> conflicted.size.toLong))
    case ("graft_publish_branch", Seq(d, n)) =>
      val dir = str(d, fn, 0)
      val v = TxLog.publishBranch(spark, dir, str(n, fn, 1))
      procReceipt(spark, "publish-branch", dir, Seq("version" -> v.toLong))
    case ("graft_drop_branch", Seq(d, n)) =>
      val dir = str(d, fn, 0)
      TxLog.deleteBranch(spark, dir, str(n, fn, 1))
      procReceipt(spark, "drop-branch", dir, Seq(
        "version" -> TxLog.currentVersion(spark, dir).toLong))
    case _ => throw new IllegalArgumentException(
      s"$fn: unsupported argument count ${args.length}")
  }

  private def optimizeReceipt(
      spark: SparkSession, dir: String, zorder: Seq[String]): DataFrame = {
    val r = graft.ops.Maintenance.run(spark, dir, zorderCols = zorder)
    procReceipt(spark, "optimize", dir, Seq(
      "dv_folded_files" -> r.foldedFiles,
      "packed_files" -> r.packedFiles,
      "files_reclaimed" -> r.filesReclaimed,
      "version" -> r.checkpointedAt.toLong))
  }

  /** One-row receipt frame: (op, target, <metric cols>…). */
  /** A CDF range bound: an int version, a tag name, or a TIMESTAMP
    * literal (resolved to the newest commit at-or-before it via the
    * in-commit stamps — [[TxLog.versionFloorAt]], so a commit-time
    * window (a, b] is exactly versions (floor(a), floor(b)]).
    */
  private def cdcBound(
      spark: SparkSession,
      dir: String,
      fn: String,
      e: Expression,
      pos: Int): Int = e.dataType match {
    case org.apache.spark.sql.types.StringType =>
      val name = str(e, fn, pos)
      TxLog.tags(spark, dir).getOrElse(name,
        throw new IllegalArgumentException(s"$fn: no tag '$name' in $dir"))
    case org.apache.spark.sql.types.TimestampType =>
      anyLit(e, fn, pos) match {
        case ts: java.sql.Timestamp =>
          TxLog.versionFloorAt(spark, dir, ts.getTime)
        case other => throw new IllegalArgumentException(
          s"$fn: unsupported timestamp literal $other")
      }
    case _ => int(e, fn, pos)
  }

  private def procReceipt(
      spark: SparkSession,
      op: String,
      dir: String,
      metrics: Seq[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(
      Seq(StructField("op", StringType, nullable = false),
        StructField("target", StringType, nullable = false)) ++
        metrics.map(m => StructField(m._1, LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row.fromSeq(
        op +: dir +: metrics.map(_._2))), schema)
  }

  /** A literal of ANY type, converted from its internal Catalyst
    * value to the external form partition-transform scans expect.
    * TIMESTAMP/DATE matter most: Catalyst holds them as Long
    * microseconds / Int days, and passing those raw would make
    * `partitionValues` type them LongType/IntegerType — the cast to
    * the table's timestamp column then reads the Long as SECONDS,
    * deriving wrong partitions silently. Convert by the literal's
    * declared dataType instead.
    */
  private def anyLit(e: Expression, fn: String, pos: Int): Any = e match {
    case lit if lit.foldable => (lit.dataType, lit.eval()) match {
      case (_, null) => null
      case (org.apache.spark.sql.types.TimestampType, micros: java.lang.Long) =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .toJavaTimestamp(micros)
      case (org.apache.spark.sql.types.DateType, days: java.lang.Integer) =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaDate(days)
      case (_, s: org.apache.spark.unsafe.types.UTF8String) => s.toString
      case (_, d: org.apache.spark.sql.types.Decimal) => d.toDouble
      case (_, other) => other
    }
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a literal, got $other")
  }

  private def dbl(e: Expression, fn: String, pos: Int): Double = e match {
    case lit if lit.foldable => lit.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a numeric literal, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a numeric literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** (identifier, info, deferred builder) triples for
    * `injectTableFunction` — deferred = emits [[GraftTableRef]].
    */
  val injectable: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] =
    Seq(
      ("graft_snapshot",
        "graft_snapshot(dir[, version]) - TxLog snapshot / time travel"),
      ("graft_history", "graft_history(dir) - commit history"),
      ("graft_diff", "graft_diff(dir, from, to) - row-level change feed"),
      ("graft_scan",
        "graft_scan(dir, col, lo, hi) - snapshot read pruned by log-carried stats"),
      ("graft_hidden_range",
        "graft_hidden_range(dir, col, lo, hi) - hidden-partition range scan"),
      ("graft_hidden_eq",
        "graft_hidden_eq(dir, col, v...) - hidden-partition equality scan"),
      ("graft_files",
        "graft_files(dir[, version]) - per-file metadata: bytes, rows, dv, stats"),
      ("graft_schema",
        "graft_schema(dir[, version]) - pinned columns with physical names, generation exprs, identity, partition membership"),
      ("graft_db",
        "graft_db(db, table[, version]) - one table of a multi-table DbLog database"),
      ("graft_optimize",
        "graft_optimize(dir[, zorder_cols]) - PROCEDURE: fold DVs + bin-pack + checkpoint"),
      ("graft_vacuum",
        "graft_vacuum(dir, retain_versions) - PROCEDURE: reclaim unreferenced files (tag-aware)"),
      ("graft_checkpoint", "graft_checkpoint(dir) - PROCEDURE: write a log checkpoint"),
      ("graft_restore", "graft_restore(dir, version|tag) - PROCEDURE: roll the table back"),
      ("graft_vacuum_dry_run",
        "graft_vacuum_dry_run(dir, retain_versions) - PROCEDURE: what vacuum WOULD reclaim, nothing touched"),
      ("graft_export_manifest",
        "graft_export_manifest(dir[, version]) - PROCEDURE: symlink-format manifest for external engines"),
      ("graft_evolve_partitioning",
        "graft_evolve_partitioning(dir, 'months:ts,...') - PROCEDURE: metadata-only partition-spec evolution"),
      ("graft_tag",
        "graft_tag(dir, name[, version]) - PROCEDURE: pin a named tag (read via graft_snapshot(dir, name))"),
      ("graft_branch",
        "graft_branch(dir, name) - snapshot of branch `name` (the audit read)"),
      ("graft_branches", "graft_branches(dir) - open branches and their base versions"),
      ("graft_tags", "graft_tags(dir) - named tags and their pinned versions"),
      ("graft_create_branch",
        "graft_create_branch(dir, name[, version]) - PROCEDURE: fork a branch"),
      ("graft_publish_branch",
        "graft_publish_branch(dir, name) - PROCEDURE: merge the branch into main atomically"),
      ("graft_publish_preview",
        "graft_publish_preview(dir, name) - what publish WOULD commit + conflict count, nothing touched"),
      ("graft_drop_branch",
        "graft_drop_branch(dir, name) - PROCEDURE: abandon the branch"),
      ("graft_changes",
        "graft_changes(dir, from, to[, 'k1,k2']) - row-level CDF with update images, per-commit; bounds are versions, tag names, or TIMESTAMP literals (keyless form pairs by _row_id on a row-tracked table)"),
      ("graft_rowids",
        "graft_rowids(dir) - the snapshot with the stable _row_id column (row tracking)"),
      ("graft_enable_rowtracking",
        "graft_enable_rowtracking(dir) - PROCEDURE: turn on stable row ids (backfills existing entries, metadata-only)"),
      ("graft_db_rename_column",
        "graft_db_rename_column(db, table, from, to) - PROCEDURE: per-table RENAME COLUMN inside a DbLog database"),
      ("graft_db_widen_column",
        "graft_db_widen_column(db, table, col, type) - PROCEDURE: per-table lossless ALTER COLUMN TYPE inside a DbLog database"),
      ("graft_replicate",
        "graft_replicate(src, dst, key) - PROCEDURE: advance (or seed) the keyed downstream replica of a logged table"),
      ("graft_replicate_rowid",
        "graft_replicate_rowid(src, dst) - PROCEDURE: keyless replication of a row-tracked table by its stable _row_id"),
      ("graft_db_changes",
        "graft_db_changes(db, table, from, to, 'k1,k2') - one table's CDF with update images; omit keys on a row-tracked table for keyless _row_id pairing"),
      ("graft_db_rowids",
        "graft_db_rowids(db, table) - one database table's rows with stable _row_id / _row_commit_version"),
      ("graft_db_enable_rowtracking",
        "graft_db_enable_rowtracking(db, table) - PROCEDURE: turn on per-table stable row ids (backfills existing entries, metadata-only)"),
      ("graft_db_replicate_rowid",
        "graft_db_replicate_rowid(db, table, dst) - PROCEDURE: keyless replication of one database table by its stable _row_id"),
      ("graft_db_compact",
        "graft_db_compact(db, table) - PROCEDURE: bin-pack one table's small files (ids travel materialized on tracked tables)"),
      ("graft_db_materialize",
        "graft_db_materialize(db, table) - PROCEDURE: fold one table's deletion vectors into its data files"),
      ("graft_dbmv_init",
        "graft_dbmv_init(db, name, fact, dim, fact_key, dim_key, 'g1,g2', sum_col) - PROCEDURE: register + seed a two-table incremental view inside the database"),
      ("graft_dbmv_star_init",
        "graft_dbmv_star_init(db, name, fact, 'dim:k1+k2;dim2:k3', 'g1,g2', 's1,s2'[, 'mm1'[, reserve_k]]) - PROCEDURE: register + seed an N-table star/snowflake incremental view (reserve_k > 0 maintains min/max through bounded extreme reserves)"),
      ("graft_dbmv_refresh",
        "graft_dbmv_refresh(db, name) - PROCEDURE: advance the view to the database's current version (state + cursor in ONE commit)"),
      ("graft_dbmv_read",
        "graft_dbmv_read(db, name[, version]) - the incremental view's rows (join or star form)"),
      ("graft_mv_follow",
        "graft_mv_follow(store_dir, name, src_dir, 'g1,g2', 's1,s2') - PROCEDURE: seed/advance a single-table MV following a TxLog table's change feed"),
      ("graft_mv_read",
        "graft_mv_read(store_dir, name) - a followed MV's rows (group cols, n, sum_*)"),
      ("graft_joinmv_follow",
        "graft_joinmv_follow(store_dir, name, fact_dir, 'dim_dir:k1+k2;...', 'g1,g2', 's1,s2'[, 'mm1']) - PROCEDURE: seed/advance a cross-directory star MV; one row per table with its cursor window"),
      ("graft_clone",
        "graft_clone(src, dst[, version|tag[, 'pin']]) - PROCEDURE: zero-copy shallow clone (metadata-only; 'pin' tags the source so vacuum keeps the cloned version)"),
      ("graft_clone_source",
        "graft_clone_source(dir) - clone provenance: (source, source_version), empty if never cloned"),
      ("graft_localize",
        "graft_localize(dir) - PROCEDURE: detach a shallow clone (copy still-based entries local)"),
      ("graft_copy_into",
        "graft_copy_into(dir, source, format[, pattern]) - PROCEDURE: idempotent ledger-tracked file ingestion (COPY INTO)"),
      ("graft_ingested",
        "graft_ingested(dir) - source files committed by prior copy-into loads"),
      ("graft_cluster_by",
        "graft_cluster_by(dir, 'c1,c2') - PROCEDURE: declare clustering columns; later OPTIMIZE passes cluster the small-file tail on them"),
      ("graft_detail",
        "graft_detail(dir) - DESCRIBE DETAIL: one-row table summary (files, bytes, layout declarations, features, provenance)"),
      ("graft_checkpoint_every",
        "graft_checkpoint_every(dir, n) - PROCEDURE: auto-checkpoint every n-th commit (0 clears)"))
      .map { case (n, u) =>
        (FunctionIdentifier(n), info(n, u),
          (args: Seq[Expression]) => GraftTableRef(n, args): LogicalPlan)
      }

  /** Immediate builders closing over `spark` — the installInto path. */
  def bound(spark: SparkSession): Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] =
    injectable.map { case (id, ei, _) =>
      (id, ei, (args: Seq[Expression]) =>
        org.apache.spark.sql.GraftShim.analyzedPlan(
          build(spark, id.funcName, args)))
    }
}
