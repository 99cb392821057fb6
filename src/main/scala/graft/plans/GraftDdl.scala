package graft.plans

import org.apache.spark.sql.{GraftShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, UnresolvedIdentifier, UnresolvedTable}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.CheckConstraint
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.command.{CreateDataSourceTableAsSelectCommand, CreateDataSourceTableCommand}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.ops.TxLog

/** SQL DDL over log-managed parquet paths — the lifecycle statements
  * around [[GraftDml]]'s writes, each landing through the transaction
  * log so creation/replacement/truncation are versioned and
  * time-travelable like every other commit:
  *
  *  - `CREATE TABLE parquet.`/t` (cols…) [PARTITIONED BY (c)]` →
  *    empty v0 + pinned schema; `NOT NULL` columns and
  *    `CONSTRAINT … CHECK (…)` clauses become the log's CHECK
  *    constraints (every write path already enforces them on its
  *    staged delta); `PARTITIONED BY` pins the hive layout so the
  *    FIRST append already lands partitioned.
  *  - `CREATE TABLE … AS SELECT` → the query's rows + conversion +
  *    schema pin; `CREATE OR REPLACE TABLE … AS SELECT` on an
  *    existing table is [[TxLog.overwriteAll]] — ONE commit, prior
  *    versions still readable (REPLACE with time travel).
  *  - `TRUNCATE TABLE` → overwrite-with-empty, same property.
  *  - `DROP TABLE` → removes the table AND its log (guarded: only
  *    log-managed paths — DROP on an arbitrary directory refuses).
  *  - `ALTER TABLE … ADD COLUMNS` / `DROP COLUMN` → a metadata-only
  *    commit + a schema pin at the new version (no data file is
  *    touched; added columns read NULL for pre-evolution rows,
  *    dropped ones vanish from reads while old snapshots keep their
  *    own width — the log-pinned versioned-schema machinery).
  *  - `ALTER TABLE … RENAME COLUMN` → metadata-only via
  *    [[graft.ops.ColumnMapping]] (Delta name-mode column mapping):
  *    data files keep their physical names forever; the pin carries
  *    logical→physical. Auto-enabled on first rename; once mapped,
  *    ADD COLUMNS assigns fresh physical names so DROP + re-ADD of
  *    the same name cannot resurrect the dropped column's values.
  *
  * Reference anchor: the reference creates its star schema with
  * hand-run DDL (`dags/create_tables.py` — nine CREATE TABLE
  * statements against Postgres); this is that surface on the lake,
  * with the log supplying atomicity the reference got from Postgres.
  */
object GraftDdl {

  /** The parquet path a DDL plan targets; None for non-DDL plans and
    * catalog-table targets (→ leave to Spark).
    */
  private[plans] def targetOf(plan: LogicalPlan): Option[String] = {
    def ident(child: LogicalPlan): Option[String] = child match {
      case UnresolvedIdentifier(Seq(fmt, p), _) if fmt.equalsIgnoreCase("parquet") =>
        Some(p)
      case u: UnresolvedTable => u.multipartIdentifier match {
        case Seq(fmt, p) if fmt.equalsIgnoreCase("parquet") => Some(p)
        case _ => None
      }
      // the analyzer's session-catalog resolution runs BEFORE injected
      // rules and reads `parquet` as a namespace of spark_catalog —
      // that resolved shape still names our path
      case r: ResolvedIdentifier
          if r.identifier.namespace.toSeq == Seq("parquet") =>
        Some(r.identifier.name)
      case _ => None
    }
    plan match {
      case c: CreateTable => ident(c.name)
      case c: CreateTableAsSelect => ident(c.name)
      case r: ReplaceTableAsSelect => ident(r.name)
      case d: DropTable => ident(d.child)
      case t: TruncateTable => ident(t.table)
      case a: AddColumns => ident(a.table)
      case d: DropColumns => ident(d.table)
      case r: RenameColumn => ident(r.table)
      case a: AlterColumns => ident(a.table)
      // the parser wraps ADD CONSTRAINT's table in a validation Filter
      // (NOT cond) — find the relation inside
      case a: AddCheckConstraint => a.child.collectFirst {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
            if u.multipartIdentifier.length == 2 &&
              u.multipartIdentifier.head.equalsIgnoreCase("parquet") =>
          u.multipartIdentifier(1)
      }
      case d: DropConstraint => ident(d.table)
      case a: org.apache.spark.sql.catalyst.plans.logical
          .AlterTableClusterBy => ident(a.table)
      // CREATE [TABLE|TABLE AS SELECT] survive the session-catalog
      // rules only as their v1 commands; the `parquet` "database" in
      // the CatalogTable identifier is our format marker
      case c: CreateDataSourceTableCommand => parquetTable(c.table)
      case c: CreateDataSourceTableAsSelectCommand => parquetTable(c.table)
      case _ => None
    }
  }

  private def parquetTable(t: CatalogTable): Option[String] =
    if (t.identifier.database.exists(_.equalsIgnoreCase("parquet")))
      Some(t.identifier.table)
    else None

  private[plans] def route(spark: SparkSession, plan: LogicalPlan): Seq[Row] =
    plan match {
      case c: CreateTable => runCreate(spark, c)
      case c: CreateTableAsSelect => runCtas(spark, c)
      case r: ReplaceTableAsSelect => runRtas(spark, r)
      case d: DropTable => runDrop(spark, d)
      case t: TruncateTable => runTruncate(spark, t)
      case a: AddColumns => runAddColumns(spark, a)
      case d: DropColumns => runDropColumns(spark, d)
      case a: AlterColumns => runAlterColumns(spark, a)
      case a: AddCheckConstraint => runAddConstraint(spark, a)
      case d: DropConstraint => runDropConstraint(spark, d)
      // ALTER TABLE … CLUSTER BY (c1, c2) / CLUSTER BY NONE —
      // re-declare (or clear) the clustering columns; the next
      // OPTIMIZE converges the unclustered tail to the new layout
      case a: org.apache.spark.sql.catalyst.plans.logical
          .AlterTableClusterBy =>
        val path = targetOf(a).get
        val cols = a.clusterBySpec.toSeq
          .flatMap(_.columnNames.map(_.fieldNames.mkString(".")))
        TxLog.setClusterColumns(spark, path, cols)
        receipt(
          if (cols.isEmpty) "cluster-by-none"
          else s"cluster-by(${cols.mkString(",")})",
          path, 0L, 0L, TxLog.currentVersion(spark, path))
      case c: CreateDataSourceTableCommand =>
        runCreateCore(spark, targetOf(c).get,
          StructType(c.table.schema.fields.toSeq),
          c.table.partitionColumnNames,
          c.table.schema.fields.toSeq.filterNot(_.nullable)
            .map(f => s"${f.name} IS NOT NULL"),
          c.ignoreIfExists)
      case c: CreateDataSourceTableAsSelectCommand =>
        val path = targetOf(c).get
        if (TxLog.exists(spark, path)) {
          if (c.mode == org.apache.spark.sql.SaveMode.Ignore)
            receipt("create-table-exists", path, 0L, 0L,
              TxLog.currentVersion(spark, path))
          else throw new IllegalArgumentException(
            s"CREATE TABLE AS SELECT: $path is already log-managed " +
              "(IF NOT EXISTS to skip)")
        } else createAs(spark, path, GraftShim.ofRows(spark, c.query),
          c.table.partitionColumnNames, "create-table-as")
      case r: RenameColumn => runRename(spark, r)
      case other => throw new IllegalArgumentException(
        s"GraftDdl.route: not a DDL plan: ${other.nodeName}")
    }

  private def identityCols(partitioning: Seq[Transform]): Seq[String] =
    partitioning.filterNot(isClusterBy).map { t =>
      val refs = t.references
      if (t.name == "identity" && refs.length == 1 &&
          refs.head.fieldNames.length == 1) refs.head.fieldNames.head
      else throw new UnsupportedOperationException(
        s"PARTITIONED BY ($t): only identity partition columns here — " +
          "hidden transforms (days/months/bucket/truncate) go through " +
          "graft.ops.PartitionTransforms (graft_hidden_* TVFs)")
    }

  private def isClusterBy(t: Transform): Boolean =
    org.apache.spark.sql.connector.expressions.ClusterByTransform
      .unapply(t).isDefined

  /** `CLUSTER BY (c1, c2)` in CREATE/CTAS/REPLACE rides the
    * partitioning list as a ClusterByTransform — extracted here into
    * the table's declared clustering columns ([[graft.ops.TxLog
    * .setClusterColumns]]): layout is a property OPTIMIZE applies
    * incrementally, never a write-time shuffle on the ingest path.
    */
  private def clusterByCols(partitioning: Seq[Transform]): Seq[String] =
    partitioning.collect {
      case org.apache.spark.sql.connector.expressions
          .ClusterByTransform(cols) =>
        cols.map(_.fieldNames.mkString("."))
    }.flatten

  /** CHECK constraints of a table spec, plus NOT NULL columns as
    * `c IS NOT NULL` checks — one enforcement surface for both.
    */
  private def constraintExprs(
      spec: TableSpecBase, columns: Seq[ColumnDefinition]): Seq[String] = {
    val checks = spec match {
      case u: UnresolvedTableSpec =>
        u.constraints.collect { case c: CheckConstraint =>
          // keep the user's constraint NAME (name<TAB>condition — the
          // form ALTER TABLE DROP CONSTRAINT can address later)
          Option(c.userProvidedName)
            .map(n => s"$n\t${c.condition}").getOrElse(c.condition)
        }
      case _ => Nil
    }
    checks ++ columns.filterNot(_.nullable).map(c => s"${c.name} IS NOT NULL")
  }

  private def receipt(
      op: String, path: String, rows: Long, files: Long, v: Int): Seq[Row] =
    Seq(Row(op, path, rows, files, v.toLong))

  private def runCreate(spark: SparkSession, c: CreateTable): Seq[Row] = {
    val schema = StructType(c.columns.map(col =>
      StructField(col.name, col.dataType, col.nullable)))
    val path = targetOf(c).get
    // `BIGINT GENERATED {ALWAYS|BY DEFAULT} AS IDENTITY [(START WITH
    // s STEP x)]` — declared in the log, filled by every append
    // surface ([[graft.ops.IdentityColumns]]). One per table. BY
    // DEFAULT admits explicit inserts and re-syncs the ledger past
    // supplied values inside the same write.
    val ids = c.columns.flatMap(cd => cd.identityColumnSpec.map(cd.name -> _))
    require(ids.size <= 1, "at most one identity column per table")
    ids.foreach { case (name, _) =>
      require(c.columns.find(_.name == name).get.dataType ==
        org.apache.spark.sql.types.LongType,
        s"identity column $name must be BIGINT")
    }
    // `GENERATED ALWAYS AS (expr)` — log-declared, filled/validated by
    // every insert surface, recomputed by update-shaped writes
    // ([[graft.ops.GeneratedColumns]])
    val gens = c.columns.toSeq
      .flatMap(cd => cd.generationExpression.map(cd.name -> _))
    gens.foreach { case (n, _) =>
      require(!ids.exists(_._1 == n),
        s"column $n cannot be both IDENTITY and GENERATED ALWAYS AS")
    }
    val receipt = runCreateCore(spark, path, schema,
      identityCols(c.partitioning),
      constraintExprs(c.tableSpec, c.columns), c.ignoreIfExists)
    ids.foreach { case (name, s) =>
      graft.ops.IdentityColumns.declare(spark, path, name,
        s.getStart, s.getStep, allowExplicit = s.isAllowExplicitInsert)
    }
    if (gens.nonEmpty) graft.ops.GeneratedColumns.declare(spark, path, gens)
    // `col TYPE DEFAULT <const>` — filled when an insert omits the
    // column; a supplied value wins (SQL-standard DEFAULT)
    val defaults = c.columns.toSeq
      .flatMap(cd => cd.defaultValue.map(cd.name -> _.originalSQL))
    defaults.foreach { case (n, _) =>
      require(!ids.exists(_._1 == n) && !gens.exists(_._1 == n),
        s"column $n: DEFAULT cannot combine with IDENTITY / GENERATED")
    }
    if (defaults.nonEmpty)
      graft.ops.DefaultColumns.declare(spark, path, defaults)
    val ccols = clusterByCols(c.partitioning)
    if (ccols.nonEmpty) TxLog.setClusterColumns(spark, path, ccols)
    receipt
  }

  private def runCreateCore(
      spark: SparkSession,
      path: String,
      schema: StructType,
      pcols: Seq[String],
      checks: Seq[String],
      ignoreIfExists: Boolean): Seq[Row] = {
    if (TxLog.exists(spark, path)) {
      if (ignoreIfExists)
        return receipt("create-table-exists", path, 0L, 0L,
          TxLog.currentVersion(spark, path))
      throw new IllegalArgumentException(
        s"CREATE TABLE: $path is already log-managed (IF NOT EXISTS to skip)")
    }
    pcols.foreach(p => require(schema.fieldNames.contains(p),
      s"PARTITIONED BY ($p): not a table column"))
    TxLog.convert(spark, path) // empty v0
    TxLog.setTableSchema(spark, path, schema, version = 0)
    if (pcols.nonEmpty) TxLog.setPartitionColumns(spark, path, pcols)
    if (checks.nonEmpty) TxLog.setCheckConstraints(spark, path, checks)
    receipt("create-table", path, 0L, 0L, 0)
  }

  private def runCtas(spark: SparkSession, c: CreateTableAsSelect): Seq[Row] = {
    val path = targetOf(c).get
    if (TxLog.exists(spark, path)) {
      if (c.ignoreIfExists)
        return receipt("create-table-exists", path, 0L, 0L,
          TxLog.currentVersion(spark, path))
      throw new IllegalArgumentException(
        s"CREATE TABLE AS SELECT: $path is already log-managed " +
          "(IF NOT EXISTS to skip, or CREATE OR REPLACE to overwrite)")
    }
    val rec = createAs(spark, path, GraftShim.ofRows(spark, c.query),
      identityCols(c.partitioning), "create-table-as")
    val ccols = clusterByCols(c.partitioning)
    if (ccols.nonEmpty) TxLog.setClusterColumns(spark, path, ccols)
    rec
  }

  private def runRtas(spark: SparkSession, r: ReplaceTableAsSelect): Seq[Row] = {
    val path = targetOf(r).get
    val df = GraftShim.ofRows(spark, r.query)
    if (TxLog.exists(spark, path)) {
      // REPLACE keeps the log: one overwrite-all commit, history
      // intact — then the pin moves to the NEW query's schema at the
      // committed version (old snapshots keep their own width)
      val pcols = identityCols(r.partitioning)
      if (pcols.nonEmpty) TxLog.setPartitionColumns(spark, path, pcols)
      // REPLACE defines a fresh table shape: stale identity/generated/
      // default declarations must not apply to the replacement frame
      // (a carried-over GENERATED ALWAYS would refuse or ghost-fill;
      // a stale identity name would refuse the new frame outright).
      // RTAS has no column list to re-derive them from — clear them,
      // but RESTORE them if the replacement query fails before the
      // overwrite commits: the old data survives a failed REPLACE, so
      // its declaration enforcement must survive with it.
      val savedIdent = graft.ops.IdentityColumns.fullSpec(spark, path)
      val savedGen = graft.ops.GeneratedColumns.spec(spark, path)
      val savedDef = graft.ops.DefaultColumns.spec(spark, path)
      graft.ops.IdentityColumns.undeclare(spark, path)
      graft.ops.GeneratedColumns.undeclare(spark, path,
        savedGen.map(_._1).toSet)
      graft.ops.DefaultColumns.undeclare(spark, path,
        savedDef.map(_._1).toSet)
      // a mapped table stays mapped across REPLACE: same-named columns
      // keep their physical names (overwriteAll's staged write spells
      // exactly those), brand-new ones write as themselves — carryOver
      // pins physical = logical for them, consistent with the files
      val oldPin = TxLog.tableSchema(spark, path)
      val (n, v) =
        try (df.count(), TxLog.overwriteAll(spark, path, df))
        catch {
          case t: Throwable =>
            savedIdent.foreach(s => graft.ops.IdentityColumns.declare(
              spark, path, s.column, s.start, s.step, s.allowExplicit))
            if (savedGen.nonEmpty)
              graft.ops.GeneratedColumns.declare(spark, path, savedGen)
            if (savedDef.nonEmpty)
              graft.ops.DefaultColumns.declare(spark, path, savedDef)
            throw t
        }
      val newPin = oldPin match {
        case Some(p) if graft.ops.ColumnMapping.isMapped(p) =>
          StructType(df.schema.fields.map { f =>
            p.fields.find(_.name == f.name) match {
              case Some(old) => f.copy(metadata = old.metadata)
              case None => f
            }
          })
        case _ => df.schema
      }
      TxLog.setTableSchema(spark, path, newPin, version = v)
      val cc = clusterByCols(r.partitioning)
      if (cc.nonEmpty) TxLog.setClusterColumns(spark, path, cc)
      receipt("replace-table", path, n, 0L, v)
    } else if (r.orCreate) {
      val rec =
        createAs(spark, path, df, identityCols(r.partitioning),
          "create-table-as")
      val cc = clusterByCols(r.partitioning)
      if (cc.nonEmpty) TxLog.setClusterColumns(spark, path, cc)
      rec
    } else throw new IllegalArgumentException(
      s"REPLACE TABLE: $path is not log-managed (OR REPLACE → CREATE " +
        "requires the OR CREATE form; use CREATE OR REPLACE TABLE)")
  }

  /** Shared CTAS tail: land the rows, convert, pin. The write happens
    * before the log exists — a brand-new directory has no readers, so
    * the non-atomic window is invisible (Delta's CTAS has the same
    * shape); conversion ADDs exactly the written files as v0.
    */
  private def createAs(
      spark: SparkSession,
      path: String,
      df: org.apache.spark.sql.DataFrame,
      pcols: Seq[String],
      op: String): Seq[Row] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(path)) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(path)).isEmpty,
      s"CREATE TABLE AS SELECT: $path exists with files but no log — " +
        "TxLog.convert(spark, dir) to adopt it, or choose a fresh path")
    val n = df.count()
    if (pcols.nonEmpty) df.write.partitionBy(pcols: _*).parquet(path)
    else df.write.parquet(path)
    TxLog.convert(spark, path)
    TxLog.setTableSchema(spark, path, df.schema, version = 0)
    if (pcols.nonEmpty) TxLog.setPartitionColumns(spark, path, pcols)
    receipt(op, path, n, TxLog.liveFiles(spark, path).length.toLong, 0)
  }

  private def runDrop(spark: SparkSession, d: DropTable): Seq[Row] = {
    val path = targetOf(d).get
    if (!TxLog.exists(spark, path)) {
      if (d.ifExists) return receipt("drop-table-missing", path, 0L, 0L, 0)
      throw new IllegalArgumentException(
        s"DROP TABLE: $path is not log-managed — refusing to delete an " +
          "arbitrary directory (use filesystem tools for unmanaged paths)")
    }
    val files = TxLog.liveFiles(spark, path).length.toLong
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    receipt("drop-table", path, 0L, files, 0)
  }

  private def runTruncate(spark: SparkSession, t: TruncateTable): Seq[Row] = {
    val path = targetOf(t).get
    require(TxLog.exists(spark, path),
      s"TRUNCATE TABLE: $path is not TxLog-managed")
    val before = TxLog.snapshot(spark, path)
    val files = TxLog.liveFiles(spark, path).length.toLong
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], before.schema)
    val v = TxLog.overwriteAll(spark, path, empty)
    // a never-pinned table needs one now: zero files leave no footer
    // to read a schema from
    if (TxLog.tableSchema(spark, path).isEmpty)
      TxLog.setTableSchema(spark, path, before.schema, v)
    receipt("truncate-table", path, 0L, files, v)
  }

  /** `ALTER TABLE … RENAME COLUMN a TO b` — metadata-only through
    * [[graft.ops.ColumnMapping]]: the first rename auto-enables the
    * mapping (freezing every column's physical name to its current
    * spelling, which is what every existing file already says), then
    * the new pin carries the new logical name over the unchanged
    * physical one. No data file is read or written; time travel below
    * the rename keeps the old name; ADD-carried stats keep pruning.
    * Partition columns and CHECK-constrained columns refuse (their
    * names are baked into paths / constraint SQL).
    */
  private def runRename(spark: SparkSession, r: RenameColumn): Seq[Row] = {
    val path = targetOf(r).get
    require(TxLog.exists(spark, path),
      s"ALTER TABLE RENAME COLUMN: $path is not TxLog-managed")
    val parts = r.column.name
    require(parts.length == 1,
      "RENAME COLUMN: nested fields are not supported here")
    val v = graft.ops.ColumnMapping.renameColumn(
      spark, path, parts.head, r.newName)
    receipt("rename-column", path, 0L, 0L, v)
  }

  private def runAddColumns(spark: SparkSession, a: AddColumns): Seq[Row] = {
    val path = targetOf(a).get
    require(TxLog.exists(spark, path),
      s"ALTER TABLE ADD COLUMNS: $path is not TxLog-managed")
    val current = TxLog.tableSchema(spark, path)
      .getOrElse(TxLog.snapshot(spark, path).schema)
    val added = a.columnsToAdd.map { q =>
      require(q.path.isEmpty && q.position.isEmpty && q.default.isEmpty,
        "ADD COLUMNS: nested fields / positions / defaults are not " +
          "supported here — top-level nullable columns only (pre-evolution " +
          "rows read NULL, so a NOT NULL or defaulted add would lie)")
      require(!current.fieldNames.contains(q.colName),
        s"ADD COLUMNS: ${q.colName} already exists")
      StructField(q.colName, q.dataType, nullable = true)
    }
    // metadata-only version bump, then the pin at the NEW version —
    // the pre-evolution versions keep their own pins (time travel
    // reads each version at its own width)
    val v = TxLog.commit(spark, path, adds = Nil, removes = Nil,
      op = Some("add-columns"))
    // under column mapping the new columns get FRESH physical names —
    // re-adding a dropped name must not resurrect its values out of
    // old footers (carryOver is the identity when unmapped)
    val widened = graft.ops.ColumnMapping.carryOver(spark, path,
      StructType(current.fields ++ added), current, v)
    TxLog.setTableSchema(spark, path, widened, v)
    receipt("add-columns", path, 0L, 0L, v)
  }

  /** The shared lossless-widening allowlist ([[graft.ops.TypeWidening]]
    * — one list for this single-table form and DbLog's per-table one).
    */
  private[plans] def canWiden(
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean =
    graft.ops.TypeWidening.canWiden(from, to)

  /** `ALTER TABLE … ALTER COLUMN c TYPE t` — metadata-only TYPE
    * WIDENING: the pin retypes the column at a new version and every
    * mixed-era read serves old footers under the wide type natively
    * (no file rewritten; probed in TypeWidenSpec across both parquet
    * readers). Narrowing and lossy casts refuse with the allowlist.
    * Hidden-partition transform sources refuse (`bucket(col)` hashes
    * differ by type — pruning would silently lie). Identity columns
    * refuse (the allocator arithmetic is BIGINT). Bloom-keyed purges
    * stay valid: Spark's BloomFilterAggregate hashes every integral
    * type as its long value, so an int-era bloom answers long probes.
    */
  private def runAlterColumns(spark: SparkSession, a: AlterColumns): Seq[Row] = {
    val path = targetOf(a).get
    require(TxLog.exists(spark, path),
      s"ALTER TABLE ALTER COLUMN: $path is not TxLog-managed")
    val current = TxLog.tableSchema(spark, path)
      .getOrElse(TxLog.snapshot(spark, path).schema)
    val hidden = scala.util.Try(
      graft.ops.PartitionTransforms.spec(spark, path)).getOrElse(Nil)
    val idCol = graft.ops.IdentityColumns.spec(spark, path).map(_._1)
    val retyped = a.specs.foldLeft(current) { (sc, spec) =>
      require(spec.column.name.length == 1,
        "ALTER COLUMN: nested fields are not supported here")
      val name = spec.column.name.head
      require(spec.newComment.isEmpty && spec.newPosition.isEmpty &&
        spec.newDefaultExpression.isEmpty && !spec.dropDefault,
        "ALTER COLUMN: only TYPE widening (and DROP NOT NULL) here")
      val f = sc.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"ALTER COLUMN: no column $name"))
      val widened = spec.newDataType match {
        case None => f
        case Some(t) =>
          require(canWiden(f.dataType, t),
            s"ALTER COLUMN $name: ${f.dataType.simpleString} -> " +
              s"${t.simpleString} is not a lossless widening the parquet " +
              "reader serves (integral up-widening, integral/float -> " +
              "double, date -> timestamp_ntz, decimal growth)")
          require(!hidden.exists(_.column == name),
            s"ALTER COLUMN $name: a hidden-partitioning transform hashes " +
              "it — retyping would change bucket/truncate derivation")
          require(!idCol.contains(name),
            s"ALTER COLUMN $name: it is the identity column (BIGINT by " +
              "construction)")
          require(!graft.ops.GeneratedColumns
              .referencedColumns(spark, path).contains(name),
            s"ALTER COLUMN $name: a GENERATED ALWAYS AS expression " +
              "references it — the stored SQL would recompute at a new " +
              "type; re-declare the generated column first")
          f.copy(dataType = t)
      }
      val renulled = spec.newNullability match {
        case Some(true) | None => widened.copy(
          nullable = widened.nullable || spec.newNullability.contains(true))
        case Some(false) => throw new IllegalArgumentException(
          "ALTER COLUMN SET NOT NULL: cannot retroactively promise " +
            "non-null for rows already on disk — add a CHECK constraint " +
            "for future writes instead (setCheckConstraints)")
      }
      StructType(sc.fields.map(x => if (x.name == name) renulled else x))
    }
    val v = TxLog.commit(spark, path, adds = Nil, removes = Nil,
      op = Some("alter-column-type"))
    TxLog.setTableSchema(spark, path, retyped, v)
    receipt("alter-column-type", path, 0L, 0L, v)
  }

  /** `ALTER TABLE … ADD CONSTRAINT name CHECK (cond)` — existing rows
    * validate FIRST (one probe scan; a constraint the data already
    * violates refuses), then every write path enforces it on its
    * staged delta. `DROP CONSTRAINT name [IF EXISTS]` removes by the
    * user name.
    */
  private def runAddConstraint(
      spark: SparkSession, a: AddCheckConstraint): Seq[Row] = {
    val path = targetOf(a).get
    require(TxLog.exists(spark, path),
      s"ALTER TABLE ADD CONSTRAINT: $path is not TxLog-managed")
    val cc = a.checkConstraint
    val name = Option(cc.userProvidedName).getOrElse(
      throw new IllegalArgumentException(
        "ADD CONSTRAINT: a name is required (CONSTRAINT <name> CHECK …)"))
    require(!cc.condition.contains('\t'),
      "ADD CONSTRAINT: literal tabs in the condition are not supported")
    TxLog.addCheckConstraint(spark, path, name, cc.condition)
    receipt("add-constraint", path, 0L, 0L,
      TxLog.currentVersion(spark, path))
  }

  private def runDropConstraint(
      spark: SparkSession, d: DropConstraint): Seq[Row] = {
    val path = targetOf(d).get
    require(TxLog.exists(spark, path),
      s"ALTER TABLE DROP CONSTRAINT: $path is not TxLog-managed")
    TxLog.dropCheckConstraint(spark, path, d.name, d.ifExists)
    receipt("drop-constraint", path, 0L, 0L,
      TxLog.currentVersion(spark, path))
  }

  private def runDropColumns(spark: SparkSession, d: DropColumns): Seq[Row] = {
    val path = targetOf(d).get
    require(TxLog.exists(spark, path),
      s"ALTER TABLE DROP COLUMN: $path is not TxLog-managed")
    val current = TxLog.tableSchema(spark, path)
      .getOrElse(TxLog.snapshot(spark, path).schema)
    val names = d.columnsToDrop.map { f =>
      val parts = f.name
      require(parts.length == 1,
        "DROP COLUMN: nested fields are not supported here")
      parts.head
    }
    val missing = names.filterNot(current.fieldNames.contains)
    if (missing.nonEmpty && !d.ifExists)
      throw new IllegalArgumentException(
        s"DROP COLUMN: ${missing.mkString(", ")} not in the table " +
          "(IF EXISTS to skip)")
    val drop = names.filter(current.fieldNames.contains).toSet
    if (drop.isEmpty)
      return receipt("drop-columns-missing", path, 0L, 0L,
        TxLog.currentVersion(spark, path))
    require(drop.size < current.fields.length,
      "DROP COLUMN: cannot drop every column")
    // a column a CHECK constraint or the partition layout references
    // cannot silently vanish
    val referenced = TxLog.checkConstraints(spark, path)
      .filter(c => drop.exists(n => c.matches(s"(?i).*\\b$n\\b.*")))
    require(referenced.isEmpty,
      s"DROP COLUMN: CHECK constraint(s) reference it: $referenced — " +
        "drop or rewrite the constraint first (setCheckConstraints)")
    require(!TxLog.partitionColumns(spark, path).exists(drop),
      "DROP COLUMN: it is a declared partition column")
    val genRefs = graft.ops.GeneratedColumns.referencedColumns(spark, path)
    require(!drop.exists(genRefs),
      "DROP COLUMN: a GENERATED ALWAYS AS expression references it — " +
        "re-declare the generated column first")
    val narrowed = StructType(current.fields.filterNot(f => drop(f.name)))
    val v = TxLog.commit(spark, path, adds = Nil, removes = Nil,
      op = Some("drop-columns"))
    TxLog.setTableSchema(spark, path, narrowed, v)
    // dropping a generated/defaulted column drops its declaration (a
    // stale one would re-fill — and so resurrect — it on the next insert)
    val genDropped =
      drop.intersect(graft.ops.GeneratedColumns.generatedNames(spark, path))
    if (genDropped.nonEmpty)
      graft.ops.GeneratedColumns.undeclare(spark, path, genDropped)
    val defDropped =
      drop.intersect(graft.ops.DefaultColumns.defaultedNames(spark, path))
    if (defDropped.nonEmpty)
      graft.ops.DefaultColumns.undeclare(spark, path, defDropped)
    if (graft.ops.IdentityColumns.spec(spark, path).exists(s => drop(s._1)))
      graft.ops.IdentityColumns.undeclare(spark, path)
    receipt("drop-columns", path, 0L, 0L, v)
  }
}
