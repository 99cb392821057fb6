package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.{DeleteWhere, DeletionVectors, TxLog}

/** SQL DML over log-managed parquet paths — `MERGE INTO`,
  * `DELETE FROM` and `UPDATE` written as ordinary Spark SQL against
  * `parquet.`/path``, routed through the transaction log's own
  * operators instead of Spark's v2-table-only DML executor:
  *
  *  - `DELETE FROM parquet.`/t` WHERE p` →
  *    [[DeleteWhere.wherePruned]] (one pushdown scan locates the
  *    files holding matches; only those rewrite, in one commit);
  *  - `UPDATE parquet.`/t` SET a = e, … WHERE p` →
  *    [[DeleteWhere.updateWhere]] (same candidate pruning,
  *    assignments applied all-at-once to matching rows);
  *  - `MERGE INTO parquet.`/t` t USING src s ON t.k = s.k
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *    → [[DeletionVectors.upsert]] (merge-on-read: same-key rows are
  *    hidden by a vector, the batch appends — O(deleted rows) write
  *    cost, Delta's DML economics);
  *  - `… WHEN MATCHED THEN DELETE` (no insert branch) →
  *    [[DeletionVectors.deleteWith]] semi-joined on the source keys.
  *
  * Two entry points share one translation ([[route]]):
  * [[GraftDml.sql]] parses and routes any statement (works in every
  * session — the `installInto` path tests and mains use), and
  * [[ResolveGraftDml]] — injected via [[graft.GraftExtensions]] —
  * rewrites the analyzer's DML plans to a [[GraftDmlCommand]], so a
  * session built with `spark.sql.extensions` runs these statements
  * through a literal `spark.sql(...)` call.
  *
  * v1 scope (clear errors outside it): the target is a parquet path;
  * merge conditions are equality conjunctions on same-named columns;
  * merge actions are the canonical UPDATE SET * / INSERT * / DELETE
  * (including the analyzer's column-by-column expansion of the
  * stars); no action-level AND conditions.
  *
  * Reference anchor: the reference lands its fact-table increment
  * with a hand-written PostgreSQL upsert (`upsert_query.text`,
  * `dags/emission-dag.py:198-208` computes the new-rows delta in
  * pandas) — this is that MERGE as one SQL statement on the lake.
  */
object GraftDml {

  val receiptSchema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("affected_rows", LongType, nullable = false),
    StructField("files_touched", LongType, nullable = false),
    StructField("version", LongType, nullable = false)))

  private def receiptAttrs: Seq[Attribute] = receiptSchema.fields.toSeq.map(
    f => AttributeReference(f.name, f.dataType, f.nullable)())

  /** Execute `sqlText`: DML statements over parquet paths route
    * through the log operators and return a one-row receipt
    * (op, target, affected_rows, files_touched, version); everything
    * else falls through to `spark.sql` verbatim.
    */
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    GraftShim.parsePlan(spark, sqlText) match {
      case p if targetOf(p).isDefined =>
        // `parquet.`/t@audit`` targets branch `audit` of /t: the DML
        // runs inside the branch scope, so its commit lands as a
        // branch version — write-audit-publish entirely in SQL. Only
        // a suffix naming an EXISTING branch splits; a literal '@' in
        // a real path is untouched.
        val (rawPath, _) = targetOf(p).get
        val (path, branch) = splitBranch(spark, rawPath)
        def strip(q: LogicalPlan): LogicalPlan = q.transformUp {
          case u: UnresolvedRelation
              if u.multipartIdentifier == Seq("parquet", rawPath) =>
            u.copy(multipartIdentifier = Seq("parquet", path))
        }
        val p2 =
          if (branch.isEmpty) p
          else strip(p) match {
            // InsertIntoStatement.table is a FIELD, not a child —
            // transformUp never visits it
            case i: InsertIntoStatement => i.copy(table = strip(i.table))
            case other => other
          }
        def run() = spark.createDataFrame(
          java.util.Arrays.asList(dispatch(spark, p2): _*), receiptSchema)
        branch match {
          case Some(b) => TxLog.withBranch(spark, path, b)(run())
          case None => run()
        }
      case p if GraftDdl.targetOf(p).isDefined =>
        // @branch composes with ALTER only: schema evolution belongs
        // on a branch (the pin is branch-scoped and publish moves it);
        // CREATE/DROP/TRUNCATE are table-level acts with no branch
        // meaning
        val rawPath = GraftDdl.targetOf(p).get
        val (path, branch) = splitBranch(spark, rawPath)
        branch.foreach { _ =>
          require(p.isInstanceOf[AddColumns] || p.isInstanceOf[DropColumns] ||
              p.isInstanceOf[RenameColumn] || p.isInstanceOf[AlterColumns],
            "@branch targets support ALTER TABLE ... COLUMNS only — " +
              "CREATE/DROP/TRUNCATE act on the table, not a branch")
        }
        val p2 =
          if (branch.isEmpty) p
          else p.transformUp {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
                if u.multipartIdentifier == Seq("parquet", rawPath) =>
              u.copy(multipartIdentifier = Seq("parquet", path))
          }
        def runDdl() = spark.createDataFrame(
          java.util.Arrays.asList(dispatch(spark, p2): _*), receiptSchema)
        branch match {
          case Some(b) => TxLog.withBranch(spark, path, b)(runDdl())
          case None => runDdl()
        }
      case _ => spark.sql(sqlText)
    }

  /** Split a `path@branch` target when (and only when) `branch` names
    * an existing branch of the TxLog-managed `path` — a literal '@'
    * in an ordinary path can never be misread, because the split only
    * happens on a positive branch probe.
    */
  private def splitBranch(
      spark: SparkSession, raw: String): (String, Option[String]) = {
    val i = raw.lastIndexOf('@')
    if (i <= 0) return (raw, None)
    val (p, b) = (raw.substring(0, i), raw.substring(i + 1))
    if (b.matches("[A-Za-z0-9_-]+") && TxLog.exists(spark, p) &&
        TxLog.branchExists(spark, p, b)) (p, Some(b))
    else (raw, None)
  }

  /** One dispatcher for both surfaces: DML plans route here, DDL
    * plans ([[GraftDdl]]) route there — the receipt schema is shared.
    */
  private[graft] def dispatch(spark: SparkSession, plan: LogicalPlan): Seq[Row] =
    if (targetOf(plan).isDefined) route(spark, plan)
    else GraftDdl.route(spark, plan)

  /** The (path, alias) of a DML plan's parquet-path target; None for
    * non-DML plans and non-path targets (→ leave to Spark).
    */
  private def targetOf(plan: LogicalPlan): Option[(String, Option[String])] =
    plan match {
      case d: DeleteFromTable => pathOf(d.table)
      case u: UpdateTable => pathOf(u.table)
      case m: MergeIntoTable => pathOf(m.targetTable)
      // INSERT INTO a LOG-MANAGED path must commit through the log:
      // Spark's own path-insert would write files no snapshot
      // references (and the orphan sweep would reclaim). Unmanaged
      // parquet paths route too — Spark's analyzer has no path-based
      // INSERT (ResolveSQLOnFile is read-only; the statement dies
      // with TABLE_OR_VIEW_NOT_FOUND) — as a plain parquet write.
      case i: InsertIntoStatement => pathOf(i.table)
      case _ => None
    }

  private def pathOf(plan: LogicalPlan): Option[(String, Option[String])] =
    plan match {
      case SubqueryAlias(ident, child) =>
        pathOf(child).map { case (p, _) => (p, Some(ident.name)) }
      case u: UnresolvedRelation => u.multipartIdentifier match {
        case Seq(fmt, p) if fmt.equalsIgnoreCase("parquet") => Some((p, None))
        case _ => None
      }
      // the resolved shape the injected rule sees (ResolveRelations
      // ran earlier in the same analyzer iteration)
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths match {
          case Seq(p) => Some((p.toUri.getPath, None))
          case _ => None
        }
      case _ => None
    }

  /** Re-unresolve an expression by NAME: resolved AttributeReferences
    * (the rule path) and alias-qualified UnresolvedAttributes (the
    * parser path) both become bare column references that resolve
    * against the operator's own fresh read of the table — carrying
    * the original exprIds into a different scan would fail analysis.
    */
  private def byName(e: Expression, aliases: Set[String]): Expression =
    e.transformUp {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
      case a: UnresolvedAttribute
          if a.nameParts.length > 1 &&
            aliases.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(a.nameParts.tail)
    }

  private def requireLogged(
      spark: SparkSession, path: String, op: String): Unit =
    require(TxLog.exists(spark, path),
      s"$op: $path is not TxLog-managed — SQL DML routes through the " +
        "transaction log (TxLog.convert(spark, dir) first)")

  /** Shared translation: execute one parsed (or analyzer-resolved)
    * DML plan, returning the receipt row.
    */
  private[graft] def route(spark: SparkSession, plan: LogicalPlan): Seq[Row] =
    plan match {
      case d: DeleteFromTable => runDelete(spark, d)
      case u: UpdateTable => runUpdate(spark, u)
      case m: MergeIntoTable => runMerge(spark, m)
      case i: InsertIntoStatement => runInsert(spark, i)
      case other => throw new IllegalArgumentException(
        s"GraftDml.route: not a DML plan: ${other.nodeName}")
    }

  private def runInsert(spark: SparkSession, i: InsertIntoStatement): Seq[Row] = {
    val (path, _) = targetOf(i).get
    require(i.partitionSpec.isEmpty && i.userSpecifiedCols.isEmpty,
      "INSERT: static PARTITION specs / explicit column lists are not " +
        "supported on log-managed paths (v1) — insert full rows")
    val logged = TxLog.exists(spark, path)
    val rows = GraftShim.ofRows(spark, i.query)
    // positional alignment to the table's columns (SQL INSERT
    // semantics; `byName` true when the statement said BY NAME); an
    // empty table has no schema to align to — the batch defines it
    val targetSchema =
      if (logged) {
        // an empty CREATEd table aligns against its pinned schema; an
        // empty un-pinned table has none — the batch defines it
        if (TxLog.liveFiles(spark, path).isEmpty) TxLog.tableSchema(spark, path)
        else Some(TxLog.read(spark, path).schema)
      } else scala.util.Try(spark.read.parquet(path).schema).toOption
    val cast = targetSchema match {
      case None => rows
      case Some(schema) =>
        val allNames = schema.fields.map(_.name).toSeq
        // GENERATED ALWAYS columns (identity + generated expressions)
        // may be omitted — the insert then aligns against the
        // remaining columns and the append path fills them. Either
        // supply EVERY table column or omit EVERY generated one;
        // partial omission would make positional mapping ambiguous.
        val auto: Set[String] = if (!logged) Set.empty
          else graft.ops.IdentityColumns.spec(spark, path).map(_._1).toSet ++
            graft.ops.GeneratedColumns.generatedNames(spark, path) ++
            graft.ops.DefaultColumns.defaultedNames(spark, path)
        val names =
          if (auto.nonEmpty &&
              rows.columns.length == allNames.count(!auto(_)))
            allNames.filterNot(auto)
          else allNames
        require(rows.columns.length == names.length,
          s"INSERT: ${rows.columns.length} columns for a " +
            s"${names.length}-column table")
        val aligned =
          if (i.byName) rows.select(names.map(
            org.apache.spark.sql.functions.col): _*)
          else rows.toDF(names: _*)
        schema.fields.filter(f => names.contains(f.name))
          .foldLeft(aligned)((d, f) =>
            d.withColumn(f.name,
              org.apache.spark.sql.functions.col(f.name).cast(f.dataType)))
    }
    val n = cast.count()
    val v =
      if (logged) {
        if (i.overwrite) TxLog.overwriteAll(spark, path, cast)
        else TxLog.append(spark, path, cast)
      } else {
        cast.write.mode(if (i.overwrite) "overwrite" else "append").parquet(path)
        0
      }
    Seq(Row(if (i.overwrite) "insert-overwrite" else "insert", path,
      n, 0L, v.toLong))
  }

  private def runDelete(spark: SparkSession, d: DeleteFromTable): Seq[Row] = {
    val (path, alias) = targetOf(d).get
    requireLogged(spark, path, "DELETE FROM")
    val cond = GraftShim.column(byName(d.condition, alias.map(_.toLowerCase).toSet))
    val r = DeleteWhere.wherePruned(spark, path, cond)
    Seq(Row("delete", path, r.deletedRows, r.candidates,
      TxLog.currentVersion(spark, path).toLong))
  }

  private def runUpdate(spark: SparkSession, u: UpdateTable): Seq[Row] = {
    val (path, alias) = targetOf(u).get
    requireLogged(spark, path, "UPDATE")
    val aliases = alias.map(_.toLowerCase).toSet
    val cond = GraftShim.column(byName(
      u.condition.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal
        .TrueLiteral), aliases))
    val sets = u.assignments.map { a =>
      val name = byName(a.key, aliases) match {
        case UnresolvedAttribute(Seq(n)) => n
        case other => throw new IllegalArgumentException(
          s"UPDATE: unsupported assignment target $other")
      }
      name -> GraftShim.column(byName(a.value, aliases))
    }
    // matched-row count for the receipt: one pushdown-pruned probe
    val matched = TxLog.read(spark, path).filter(cond).count()
    val r = DeleteWhere.updateWhere(spark, path, cond, sets.toSeq)
    Seq(Row("update", path, matched, r.candidates,
      TxLog.currentVersion(spark, path).toLong))
  }

  private def runMerge(spark: SparkSession, m: MergeIntoTable): Seq[Row] = {
    val (path, tAlias) = targetOf(m).get
    requireLogged(spark, path, "MERGE INTO")
    val sAlias = m.sourceTable match {
      case SubqueryAlias(ident, _) => Some(ident.name)
      case _ => None
    }
    val source = GraftShim.ofRows(spark, m.sourceTable)
    val tSet = m.targetTable.outputSet
    val sSet = m.sourceTable.outputSet
    // ON t.k1 = s.k1 AND t.k2 = s.k2 … → key columns. Sides resolve by
    // alias prefix (parser path) or attribute membership (rule path);
    // v1 requires same-named keys on both sides.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def sideAndName(e: Expression): Option[(String, String)] = e match {
      case a: UnresolvedAttribute if a.nameParts.length > 1 =>
        val q = a.nameParts.head.toLowerCase
        if (tAlias.exists(_.equalsIgnoreCase(q))) Some(("t", a.nameParts.last))
        else if (sAlias.exists(_.equalsIgnoreCase(q))) Some(("s", a.nameParts.last))
        else None
      case a: AttributeReference =>
        if (tSet.contains(a)) Some(("t", a.name))
        else if (sSet.contains(a)) Some(("s", a.name))
        else None
      case _ => None
    }
    val keyPairs: Seq[(String, String)] = conjuncts(m.mergeCondition).map {
      case EqualTo(l, r) =>
        (sideAndName(l), sideAndName(r)) match {
          case (Some(("t", tn)), Some(("s", sn))) => (tn, sn)
          case (Some(("s", sn)), Some(("t", tn))) => (tn, sn)
          case other => throw new IllegalArgumentException(
            s"MERGE: unsupported ON conjunct ${EqualTo(l, r).sql} — " +
              "t.k = s.k equalities only " +
              s"(got $other)")
        }
      case other => throw new IllegalArgumentException(
        s"MERGE: unsupported ON conjunct — equality only, got ${other.sql}")
    }
    require(keyPairs.nonEmpty, "MERGE: no key columns in ON")
    val keyCols = keyPairs.map(_._1)
    def unconditional(a: MergeAction): Boolean = a match {
      case UpdateStarAction(c) => c.isEmpty
      case InsertStarAction(c) => c.isEmpty
      case DeleteAction(c) => c.isEmpty
      case UpdateAction(c, as, _) => c.isEmpty && identityAssignments(as)
      case InsertAction(c, as) => c.isEmpty && identityAssignments(as)
      case _ => false
    }
    // the analyzer expands SET * / INSERT * into column-by-column
    // assignments target.c := source.c — recognize that as the star
    def identityAssignments(as: Seq[Assignment]): Boolean =
      as.forall { a =>
        (byName(a.key, Set.empty), byName(a.value, Set.empty)) match {
          case (UnresolvedAttribute(kp), UnresolvedAttribute(vp)) =>
            kp.last == vp.last
          case _ => false
        }
      }
    val isUpsert = m.matchedActions.exists {
      case _: UpdateStarAction | _: UpdateAction => true; case _ => false
    } || m.notMatchedActions.nonEmpty
    val isDelete = m.matchedActions.exists {
      case _: DeleteAction => true; case _ => false
    }
    // the canonical shapes keep their key-pruned fast paths; every
    // other clause combination lowers onto the general row-precise
    // executor
    val simple = m.notMatchedBySourceActions.isEmpty &&
      m.matchedActions.forall(unconditional) &&
      m.notMatchedActions.forall(unconditional) &&
      !(isUpsert && isDelete) &&
      keyPairs.forall(p => p._1.equalsIgnoreCase(p._2))
    if (!simple)
      return runMergeGeneral(spark, path, m, keyPairs, tAlias, sAlias, source)
    if (isDelete) {
      import org.apache.spark.sql.functions.col
      val keys = source.select(keyCols.map(col): _*).distinct()
      val r = DeletionVectors.deleteWith(spark, path,
        _.join(keys, keyCols, "left_semi"))
      Seq(Row("merge-delete", path, r.deletedRows, r.touched,
        TxLog.currentVersion(spark, path).toLong))
    } else {
      val srcRows = source.count()
      val r = DeletionVectors.upsert(spark, path, source, keyCols)
      Seq(Row("merge", path, srcRows, r.touched + r.insertedFiles,
        TxLog.currentVersion(spark, path).toLong))
    }
  }

  /** The GENERAL MERGE executor — conditional clauses (`WHEN MATCHED
    * AND cond`), explicit SET lists, UPDATE+DELETE mixes and `WHEN
    * NOT MATCHED BY SOURCE` — by lowering every clause onto ONE
    * row-precise merge-on-read commit ([[DeletionVectors
    * .applyRowChanges]]): the positioned target joins the source on
    * the key equality, each row class (matched / source-only /
    * target-only) picks its FIRST satisfied clause (SQL MERGE order
    * semantics; a NULL condition never fires), an UPDATE contributes
    * its old position to the hide-set and its new image to the
    * append-set, a DELETE just the position, an INSERT just the
    * image. A target row matched by more than one source row whose
    * clause fires is rejected — the SQL nondeterministic-update
    * error. Cost: one join over the target snapshot + O(changed
    * rows) write bytes; `WHEN NOT MATCHED BY SOURCE` inherently
    * reads the whole target (every target row is a candidate).
    */
  private def runMergeGeneral(
      spark: SparkSession,
      path: String,
      m: MergeIntoTable,
      keyPairs: Seq[(String, String)],
      tAlias: Option[String],
      sAlias: Option[String],
      source: DataFrame): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, count, lit, when}
    val tSet = m.targetTable.outputSet
    val sSet = m.sourceTable.outputSet
    val empty = TxLog.liveFiles(spark, path).isEmpty
    val tSchema =
      if (empty) TxLog.tableSchema(spark, path).getOrElse(
        throw new IllegalArgumentException(
          "MERGE into an empty un-pinned table — pin a schema first"))
      else TxLog.read(spark, path).schema
    val tCols = tSchema.fieldNames.toSeq
    val sCols = source.columns.toSeq
    def canon(cols: Seq[String], n: String): Option[String] =
      cols.find(_.equalsIgnoreCase(n))
    // a GENERATED ALWAYS identity column never takes a clause-supplied
    // value: SET/INSERT naming it refuses up front (insert images then
    // carry NULL there and applyRowChanges fills from the ledger). The
    // one admitted shape is the expanded `UPDATE SET *`'s no-op
    // assignment id := s.<key> when the identity IS an ON key — equal
    // by the join, so nothing is being supplied.
    graft.ops.IdentityColumns.fullSpec(spark, path)
      .filterNot(_.allowExplicit).map(_.column)
      .filter(c => tCols.exists(_.equalsIgnoreCase(c))).foreach { idc =>
        val keyedSrc: Set[String] = keyPairs.collect {
          case (tk, sk) if tk.equalsIgnoreCase(idc) => sk.toLowerCase
        }.toSet
        def assignedName(a: Assignment): Option[String] = a.key match {
          case UnresolvedAttribute(parts) => Some(parts.last)
          case ar: AttributeReference => Some(ar.name)
          case _ => None
        }
        def valueIsSourceKey(a: Assignment): Boolean = a.value match {
          case ua: UnresolvedAttribute =>
            // the name must resolve to the SOURCE side before the key
            // match — `SET id = t.<srcKeyName>` is a real supply, not
            // the join-equal no-op shape
            val n = ua.nameParts.last.toLowerCase
            val onSourceSide =
              if (ua.nameParts.length > 1)
                sAlias.exists(_.equalsIgnoreCase(ua.nameParts.head))
              else canon(sCols, n).isDefined && canon(tCols, n).isEmpty
            onSourceSide && keyedSrc(n)
          case ar: AttributeReference =>
            sSet.contains(ar) && keyedSrc(ar.name.toLowerCase)
          case _ => false
        }
        def refuse(what: String): Nothing = throw new IllegalArgumentException(
          s"MERGE: identity column $idc is GENERATED ALWAYS — $what " +
            "must not supply it (omit it; declare GENERATED BY DEFAULT " +
            "to admit explicit values)")
        // UPDATE SET * assigns the SAME-NAMED source column into the
        // identity — safe only when that source column is itself the
        // ON key paired with the identity (equal by the join); an
        // identity paired with a DIFFERENTLY-named key plus a stray
        // same-named source column would silently supply it
        val starSafe = canon(sCols, idc).map(_.toLowerCase).exists(keyedSrc)
        (m.matchedActions ++ m.notMatchedBySourceActions).foreach {
          case UpdateAction(_, as, _) =>
            as.foreach(a => if (assignedName(a).exists(_.equalsIgnoreCase(idc))
              && !valueIsSourceKey(a)) refuse("UPDATE SET"))
          case _: UpdateStarAction if !starSafe =>
            refuse("UPDATE SET * (the same-named source column is not " +
              "the ON key paired with the identity)")
          case _ => ()
        }
        m.notMatchedActions.foreach {
          case InsertAction(_, as) =>
            as.foreach(a => if (assignedName(a)
              .exists(_.equalsIgnoreCase(idc))) refuse("INSERT"))
          case _: InsertStarAction => refuse("INSERT *")
          case _ => ()
        }
      }
    def ucol(prefix: String, n: String) =
      UnresolvedAttribute(Seq(prefix + n))
    // rewrite a clause expression onto the prefixed join frame; `bare`
    // fixes which side unqualified names may mean ("s" inside INSERT
    // values, "t" inside NOT MATCHED BY SOURCE, "auto" elsewhere —
    // ambiguity is an error, the SQL rule)
    def rw(e: Expression, bare: String): org.apache.spark.sql.Column =
      GraftShim.column(e.transformUp {
        case a: AttributeReference if tSet.contains(a) =>
          ucol("__t_", canon(tCols, a.name).getOrElse(a.name))
        case a: AttributeReference if sSet.contains(a) =>
          ucol("__s_", canon(sCols, a.name).getOrElse(a.name))
        case a: UnresolvedAttribute if a.nameParts.length > 1 &&
            tAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
          ucol("__t_",
            canon(tCols, a.nameParts.last).getOrElse(a.nameParts.last))
        case a: UnresolvedAttribute if a.nameParts.length > 1 &&
            sAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
          ucol("__s_",
            canon(sCols, a.nameParts.last).getOrElse(a.nameParts.last))
        case a: UnresolvedAttribute if a.nameParts.length == 1 =>
          val n = a.nameParts.head
          (canon(tCols, n), canon(sCols, n), bare) match {
            case (_, Some(s0), "s") => ucol("__s_", s0)
            case (Some(t0), _, "t") => ucol("__t_", t0)
            case (Some(t0), None, _) => ucol("__t_", t0)
            case (None, Some(s0), _) => ucol("__s_", s0)
            case (Some(_), Some(_), _) => throw new IllegalArgumentException(
              s"MERGE: ambiguous column $n — qualify with the " +
                "target/source alias")
            case _ => throw new IllegalArgumentException(
              s"MERGE: unknown column $n")
          }
      })
    def condOf(a: MergeAction): Option[Expression] = a match {
      case UpdateAction(c, _, _) => c
      case UpdateStarAction(c) => c
      case DeleteAction(c) => c
      case InsertAction(c, _) => c
      case InsertStarAction(c) => c
      case other => throw new IllegalArgumentException(
        s"MERGE: unsupported action $other")
    }
    // first-satisfied-clause index (1-based; 0 = no clause fires)
    def clauseIdx(actions: Seq[MergeAction], bare: String) =
      actions.zipWithIndex.foldRight(lit(0)) { case ((a, i), els) =>
        when(condOf(a).map(rw(_, bare)).getOrElse(lit(true)), lit(i + 1))
          .otherwise(els)
      }
    // the target-schema image an UPDATE/INSERT action produces
    def image(a: MergeAction, bare: String): Seq[org.apache.spark.sql.Column] =
      a match {
        case _: UpdateStarAction | _: InsertStarAction =>
          tCols.map(c => col("__s_" + canon(sCols, c).getOrElse(
            throw new IllegalArgumentException(
              s"MERGE: * needs source column $c"))).as(c))
        case UpdateAction(_, as, _) => assignImage(as, bare, insert = false)
        case InsertAction(_, as) => assignImage(as, bare, insert = true)
        case other => throw new IllegalStateException(s"image($other)")
      }
    def assignImage(as: Seq[Assignment], bare: String, insert: Boolean) = {
      val byKey: Map[String, Expression] = as.map { a =>
        val key = a.key match {
          case UnresolvedAttribute(parts) =>
            canon(tCols, parts.last).getOrElse(
              throw new IllegalArgumentException(
                s"MERGE: SET/INSERT names unknown target column " +
                  s"${parts.last}"))
          case ar: AttributeReference =>
            canon(tCols, ar.name).getOrElse(ar.name)
          case other => throw new IllegalArgumentException(
            s"MERGE: unsupported assignment key $other")
        }
        key -> a.value
      }.toMap
      tCols.map { c =>
        byKey.get(c).map(v => rw(v, bare).as(c)).getOrElse(
          if (insert) // unnamed column of an INSERT (cols) list → NULL
            lit(null).cast(tSchema(c).dataType).as(c)
          else col("__t_" + c).as(c)) // UPDATE keeps the current value
      }
    }
    val src = source.select(sCols.map(c => col(c).as("__s_" + c)): _*)
      .localCheckpoint()
    // row tracking: read the target positioned WITH materialized ids
    // so every UPDATE image inherits its row's id; INSERT images carry
    // NULL there and resolve to fresh position-derived ids
    val tracked = graft.ops.RowTracking.enabled(spark, path)
    val matC = graft.ops.RowTracking.MatCol
    def trackedCols(of: DataFrame): Seq[org.apache.spark.sql.Column] =
      if (!tracked) Nil
      else if (of.columns.contains(matC)) Seq(col(matC))
      else Seq(lit(null).cast("long").as(matC))
    val tgt =
      if (empty) None
      else {
        val ps =
          if (tracked) graft.ops.RowTracking.positionedWithIds(spark, path)
          else DeletionVectors.positionedSnapshot(spark, path)
        Some(ps.select(
          tCols.map(c => col(c).as("__t_" + c)) ++
            Seq(col("__graft_file"), col("__graft_pos")) ++
            (if (tracked) Seq(col(matC)) else Nil): _*))
      }
    val joinCond = keyPairs.map { case (tk, sk) =>
      col("__t_" + canon(tCols, tk).getOrElse(tk)) ===
        col("__s_" + canon(sCols, sk).getOrElse(
          throw new IllegalArgumentException(
            s"MERGE: ON key $sk is not a source column")))
    }.reduce(_ && _)
    val emptyHides = src.limit(0).select(
      lit("").as("__graft_file"), lit(0L).as("__graft_pos"))
    var hides = Seq(emptyHides)
    var appends = Seq.empty[DataFrame] // update images (their rows hide too)
    var inserts = Seq.empty[DataFrame] // brand-new rows
    // MATCHED clauses
    if (m.matchedActions.nonEmpty && tgt.isDefined) {
      val matched = tgt.get.join(src, joinCond, "inner")
        .withColumn("__clause", clauseIdx(m.matchedActions, "auto"))
        .localCheckpoint() // clause masks + images + dup check share it
      val fired = matched.filter(col("__clause") > 0)
      val dups = fired.groupBy("__graft_file", "__graft_pos")
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
      require(dups == 0,
        "MERGE: a target row matches multiple source rows with an " +
          "applicable clause — nondeterministic update (dedupe the " +
          "source on the ON keys first)")
      hides :+= fired.select(col("__graft_file"), col("__graft_pos"))
      m.matchedActions.zipWithIndex.foreach {
        case (_: DeleteAction, _) => () // position hidden, no image
        case (a, i) =>
          appends :+= matched.filter(col("__clause") === i + 1)
            .select(image(a, "auto") ++ trackedCols(matched): _*)
      }
    }
    // NOT MATCHED (by target) clauses — source-only rows insert
    if (m.notMatchedActions.nonEmpty) {
      val srcOnly = (tgt match {
        case Some(t0) =>
          val tgtKeys = t0.select(keyPairs.map(p =>
            col("__t_" + canon(tCols, p._1).getOrElse(p._1))): _*).distinct()
          src.join(tgtKeys, joinCond, "left_anti")
        case None => src
      }).withColumn("__clause", clauseIdx(m.notMatchedActions, "s"))
      m.notMatchedActions.zipWithIndex.foreach { case (a, i) =>
        inserts :+= srcOnly.filter(col("__clause") === i + 1)
          .select(image(a, "s") ++ trackedCols(srcOnly): _*)
      }
    }
    // NOT MATCHED BY SOURCE clauses — target-only rows update/delete
    if (m.notMatchedBySourceActions.nonEmpty && tgt.isDefined) {
      val srcKeys = src.select(keyPairs.map(p =>
        col("__s_" + canon(sCols, p._2).getOrElse(p._2))): _*).distinct()
      val tgtOnly = tgt.get.join(srcKeys, joinCond, "left_anti")
        .withColumn("__clause",
          clauseIdx(m.notMatchedBySourceActions, "t"))
        .localCheckpoint()
      hides :+= tgtOnly.filter(col("__clause") > 0)
        .select(col("__graft_file"), col("__graft_pos"))
      m.notMatchedBySourceActions.zipWithIndex.foreach {
        case (_: DeleteAction, _) => ()
        case (a, i) =>
          appends :+= tgtOnly.filter(col("__clause") === i + 1)
            .select(image(a, "t") ++ trackedCols(tgtOnly): _*)
      }
    }
    val allHides = hides.reduce(_ unionByName _)
    val emptyImages = src.limit(0).select(tCols.map(c =>
      lit(null).cast(tSchema(c).dataType).as(c)) ++
      (if (tracked) Seq(lit(null).cast("long").as(matC)) else Nil): _*)
    val allInserts = inserts.reduceOption(_ unionByName _)
      .getOrElse(emptyImages)
      .localCheckpoint() // one plan for the count and the staged write
    val insertRows = allInserts.count()
    val allAppends = appends.reduceOption(_ unionByName _)
      .getOrElse(emptyImages).unionByName(allInserts)
    // affected = rows hidden (deletes + updates, each once) + fresh
    // inserts — an UPDATE's new image is not double-counted
    val r = DeletionVectors.applyRowChanges(
      spark, path, allHides, allAppends, op = "merge")
    Seq(Row("merge", path, r.replacedRows + insertRows,
      r.touched + r.insertedFiles,
      TxLog.currentVersion(spark, path).toLong))
  }

  /** The command the injected rule rewrites DML plans into — executes
    * eagerly (RunnableCommand), returning the receipt row.
    */
  final case class GraftDmlCommand(dml: LogicalPlan)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = receiptAttrs
    override def run(session: SparkSession): Seq[Row] = dispatch(session, dml)
  }

  /** Analyzer rule ([[graft.GraftExtensions]] injects it): a
    * top-level DML plan over a parquet path becomes a
    * [[GraftDmlCommand]] — stock Spark would reject it in
    * CheckAnalysis ("only supported with v2 tables"). Matching is
    * shape-guarded: anything route() cannot translate is left for
    * Spark's own error path.
    */
  final class ResolveGraftDml(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case _: GraftDmlCommand => plan
      case d: DeleteFromTable if targetOf(d).isDefined => GraftDmlCommand(d)
      case u: UpdateTable if targetOf(u).isDefined => GraftDmlCommand(u)
      case m: MergeIntoTable
          if targetOf(m).isDefined && m.targetTable.resolved &&
            m.sourceTable.resolved =>
        GraftDmlCommand(m)
      case i: InsertIntoStatement
          if targetOf(i).isDefined && i.query.resolved =>
        GraftDmlCommand(i)
      // DDL over parquet paths: stock Spark would try to resolve
      // "parquet" as a catalog and fail — same rewrite, same command
      case c: CreateTableAsSelect
          if GraftDdl.targetOf(c).isDefined && c.query.resolved =>
        GraftDmlCommand(c)
      case r: ReplaceTableAsSelect
          if GraftDdl.targetOf(r).isDefined && r.query.resolved =>
        GraftDmlCommand(r)
      case p @ (_: CreateTable | _: DropTable | _: TruncateTable |
                _: AddColumns | _: DropColumns | _: RenameColumn |
                _: AlterColumns | _: AddCheckConstraint | _: DropConstraint)
          if GraftDdl.targetOf(p).isDefined =>
        GraftDmlCommand(p)
      // session-catalog resolution converts path CREATE [AS SELECT]
      // into these v1 commands before injected rules run — without
      // this rewrite they would CREATE A METASTORE TABLE named by the
      // path in a phantom `parquet` database
      case c: org.apache.spark.sql.execution.command.CreateDataSourceTableCommand
          if GraftDdl.targetOf(c).isDefined =>
        GraftDmlCommand(c)
      case c: org.apache.spark.sql.execution.command.CreateDataSourceTableAsSelectCommand
          if GraftDdl.targetOf(c).isDefined && c.query.resolved =>
        GraftDmlCommand(c)
      case _ => plan
    }
  }
}
