package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Idempotent, ledger-tracked bulk file ingestion into a [[TxLog]]
  * table — the declarative replacement for the reference's move-to-
  * archive checkpointing (`dags/emission-dag.py:41,49,59`: consumed
  * CSVs are MOVED to `*_used_data/<name>_<timestamp>.csv` to mark
  * them loaded). Instead of mutating the landing zone, every load
  * records the exact source files it committed in a ledger shard
  * inside the transaction log, and the next load anti-joins the
  * listing against the union of committed shards — a re-run (cron
  * double-fire, retried orchestrator task, operator re-issue) loads
  * nothing twice, and the landing zone stays append-only for every
  * other consumer. Delta Lake's documented `COPY INTO` semantics,
  * re-derived on the log's own txn primitives.
  *
  * Exactly-once anatomy (the crash windows):
  *   1. the ledger shard (`ingest.<id>.txt`, one qualified source
  *      path per line) writes FIRST;
  *   2. the staged data files move in;
  *   3. an evolving load writes its widened schema pin (keyed to the
  *      version about to land — inert until a commit reaches it);
  *   4. ONE commit lands carrying txn `copyinto:<id>`.
  * A shard counts only when its txn committed, so a crash after
  * (1)–(3) leaves an invalid shard (ignored — its files re-ingest
  * next run, no loss) plus at worst orphan data files no snapshot
  * references (vacuum-clears them) and, after (3), a benign one-
  * commit-early schema widen. A crash after (4) is a completed load
  * with the pin already durable — no window leaves committed rows
  * whose evolved column is unreadable. Double-ingestion is
  * impossible in every window; the probe is
  * [[TxLog.txnCommitted]], the same one that makes streaming epoch
  * replay a no-op — and it survives log pruning via the checkpoint's
  * cumulative txn set.
  *
  * 100 TB shape: discovery is one driver-side glob — the same bound
  * as Delta's COPY INTO (O(landing-zone files), names only, ~100 B
  * each). The committed set folds from ledger shards (one small read
  * per PRIOR load, not per source file), and the skip check is a set
  * difference on names. The batch must be enumerated driver-side
  * anyway to construct the scan, so nothing here exceeds the listing
  * bound; the data itself streams through the same pinned-schema scan
  * → identity/default/generated fill → CHECK enforcement → staged
  * parquet write → rename path every other committed write uses —
  * fully distributed, never driver-materialized. Landing zones too
  * large to list whole are partitioned by convention (e.g. dated
  * prefixes) and loaded via [[copyIntoByPrefix]]: prefixes enumerate
  * driver-side, per-prefix file listings happen on the EXECUTORS,
  * and the driver's peak listing is one prefix, never the zone.
  *
  * Multi-loader concurrency (beyond Delta's single-loader bound): N
  * loaders may split one zone. Disjoint `pattern`s never meet; on a
  * SHARED pattern, racing loaders serialize per source file through
  * kernel-atomic CLAIM files (`claim.<digest>.txt` beside the ledger,
  * landed with the version files' no-overwrite primitive): each
  * loader ingests only the files it claimed, a file claimed by a
  * live racer is skipped (it loads exactly once, by the claim
  * winner), and a claim whose load CRASHED is stolen after its lease
  * expires (`claimLeaseMs` — the crashed batch's files re-ingest
  * then, no loss). The one remaining bound is the lease itself: a
  * load stalled past its lease can be stolen mid-flight and that
  * file double-loads — size the lease above the slowest plausible
  * load, the standard lease trade every claim-based loader makes.
  * The commit stays safe under any concurrency regardless.
  */
object CopyInto {

  /** One load's receipt: the commit it landed (unchanged current
    * version when nothing was new), how many files/rows it loaded,
    * and how many listed files the ledger skipped.
    */
  final case class Result(
      version: Int, filesLoaded: Int, rowsLoaded: Long, filesSkipped: Int)

  private val ShardPrefix = "ingest."
  private val ClaimPrefix = "claim."
  private def txnOf(id: String) = s"copyinto:$id"

  private def digestOf(path: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Try to own claim file `name`; true = this loader holds it. A
    * lost claim is re-examined: a LIVE holder (claim-file mtime
    * younger than `leaseMs` on the shared filesystem's own clock —
    * see [[fsAge]]) keeps it; a holder whose txn already committed, or
    * whose lease expired (a crashed load), is STOLEN — the arbiter
    * is an atomic RENAME of the old claim to a unique tombstone, so
    * exactly one stealer proceeds to re-claim (a blind delete would
    * let two stealers both delete and both land a claim, the
    * double-load the claim exists to prevent). The tombstone ends in
    * `.tmp` so a crash between rename and delete leaves only what
    * vacuum's stale-tmp sweep already clears.
    */
  private def claimOne(
      spark: SparkSession,
      dir: String,
      name: String,
      id: String,
      leaseMs: Long): Boolean = {
    val fs = Compact.fsOf(spark, dir)
    val logDir = new Path(dir, "_txlog")
    val dest = new Path(logDir, name)
    def tryClaim(): Boolean = {
      val tmp =
        new Path(logDir, s".$name.${java.util.UUID.randomUUID}.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"$id\n${System.currentTimeMillis()}".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      TxLog.atomicClaim(fs, tmp, dest)
    }
    def steal(): Boolean = {
      val tomb = new Path(logDir,
        s".$name.stolen.${java.util.UUID.randomUUID}.tmp")
      if (fs.rename(dest, tomb)) { fs.delete(tomb, false); tryClaim() }
      else false // another stealer won the rename
    }
    // lease age measured on ONE clock — the shared filesystem's: the
    // claim's mtime vs a fresh probe file's mtime. Comparing the
    // holder's embedded wall-clock against a stealer's local clock
    // would let cross-node skew shrink (steal a live claim → double
    // load) or extend the lease; fs mtimes come from the same
    // authority for every loader. Cost: one tiny create+stat+delete,
    // only on a CONTESTED claim.
    def fsAge(): Option[Long] = {
      val probe = new Path(logDir,
        s".clock.${java.util.UUID.randomUUID}.tmp")
      try {
        val out = fs.create(probe, true)
        try out.write('.') finally out.close()
        val now = fs.getFileStatus(probe).getModificationTime
        Some(now - fs.getFileStatus(dest).getModificationTime)
      } catch {
        case _: java.io.IOException => None // claim vanished under us
      } finally {
        try fs.delete(probe, false)
        catch { case _: java.io.IOException => () }
      }
    }
    if (tryClaim()) true
    else TxLog.metaRead(spark, dir, name)
      .map(_.linesIterator.toList) match {
        case Some(hid :: _ :: _) =>
          val live = fsAge() match {
            case Some(age) => age < leaseMs
            case None => return false // vanished under us: skip this run
          }
          if (!TxLog.txnCommitted(spark, dir, txnOf(hid)) && live) false
          else steal() // committed residue or expired lease
        case _ => false // vanished/garbled under us: skip this run
      }
  }

  /** The per-file multi-loader handshake: claim each candidate, keep
    * the files THIS loader won — then RE-CHECK the committed set: a
    * racer may have committed (and released its claim on) a file
    * between our ledger read and our claim win, and the fresh-claim
    * success path cannot see that. One post-claim re-read is
    * airtight: a racer's commit precedes its release precedes our
    * win. Driver-side, O(batch) tiny FS ops — the listing's bound.
    */
  private def claimFresh(
      spark: SparkSession,
      dir: String,
      id: String,
      fresh: Seq[String],
      leaseMs: Long): Seq[String] = {
    val won = fresh.filter(f =>
      claimOne(spark, dir, s"$ClaimPrefix${digestOf(f)}.txt", id, leaseMs))
    if (won.isEmpty) won
    else {
      val committed = ingestedFiles(spark, dir).toSet
      val (dup, ok) = won.partition(committed)
      releaseClaims(spark, dir, dup, id)
      ok
    }
  }

  private val EvolveLockName = s"${ClaimPrefix}__evolve__.txt"

  /** Serialize EVOLVING loads on one table: two concurrent loaders
    * each widening the pin would race the version-keyed pin slot
    * (the second `setTableSchema` overwrites the first, and a
    * failure retraction could delete the survivor's pin) — so an
    * evolving load takes this single lock for its duration, with the
    * same lease/steal semantics as the file claims. A live holder
    * refuses loudly rather than queueing: the caller retries after
    * the in-flight evolution commits.
    */
  private def acquireEvolveLock(
      spark: SparkSession, dir: String, id: String, leaseMs: Long): Unit =
    require(claimOne(spark, dir, EvolveLockName, id, leaseMs),
      s"copyInto: another evolving load is in flight on $dir — " +
        "retry after it commits (or after its lease expires)")

  /** Delete claim file `name` ONLY if this loader still owns it — a
    * loader that outlived its lease (its claim stolen, the stealer's
    * claim now under the same name) must not delete the new holder's
    * claim on its way out, or a THIRD claimant would win while the
    * stealer still runs. The read-then-delete window is micro-scale
    * vs the lease's minutes and additionally requires the steal to
    * land exactly inside it; the residual exposure is the documented
    * lease bound, not a new one.
    */
  private def releaseOwned(
      spark: SparkSession, dir: String, name: String, id: String): Unit = {
    val fs = Compact.fsOf(spark, dir)
    val owned = TxLog.metaRead(spark, dir, name)
      .exists(_.linesIterator.nextOption().contains(id))
    if (owned)
      fs.delete(new Path(new Path(dir, "_txlog"), name), false)
  }

  private def releaseEvolveLock(
      spark: SparkSession, dir: String, id: String): Unit =
    releaseOwned(spark, dir, EvolveLockName, id)

  /** Release this load's claims (post-commit: the ledger shard now
    * answers dedup; pre-commit failure: the files must become
    * claimable again immediately, not after a lease). Ownership-
    * checked per claim — see [[releaseOwned]].
    */
  private def releaseClaims(
      spark: SparkSession, dir: String, files: Seq[String],
      id: String): Unit =
    files.foreach { f =>
      releaseOwned(spark, dir, s"$ClaimPrefix${digestOf(f)}.txt", id)
    }

  /** Source files already committed into `dir` — the union of every
    * ledger shard whose transaction landed. Shards whose txn never
    * committed (a crashed load) are ignored here and harmless on
    * disk: their files simply re-ingest.
    */
  def ingestedFiles(spark: SparkSession, dir: String): Seq[String] =
    TxLog.metaList(spark, dir, ShardPrefix).flatMap { n =>
      val id = n.substring(ShardPrefix.length, n.length - 4)
      if (TxLog.txnCommitted(spark, dir, txnOf(id)))
        TxLog.metaRead(spark, dir, n).toSeq
          .flatMap(_.linesIterator).filter(_.nonEmpty)
      else Nil
    }.distinct.sorted

  /** [[copyInto]] over a landing zone too large to list whole: the
    * zone's FIRST-LEVEL prefixes (dated dirs, producer shards) are
    * enumerated driver-side — O(prefixes), names only — then each
    * prefix's files are counted ON THE EXECUTORS in parallel (session
    * conf shipped; the driver holds one (prefix, count) pair per
    * prefix, never the zone's file list), and each non-empty prefix
    * loads as its own [[copyInto]] call — one commit per prefix, so
    * the driver's peak listing is ONE prefix's files, not the zone's.
    * Top-level files outside any prefix load in one final call.
    *
    * Exactly-once and multi-loader semantics are [[copyInto]]'s own
    * (the ledger and per-file claims are per-TABLE, not per-prefix);
    * racing loaders walk the prefixes in loader-specific order, so N
    * loaders on one zone mostly claim disjoint prefixes and serialize
    * per-file only where they collide. Returns the aggregate receipt
    * (version = the table's version after the last commit).
    */
  def copyIntoByPrefix(
      spark: SparkSession,
      dir: String,
      source: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty,
      pattern: String = "*",
      force: Boolean = false,
      evolveSchema: Boolean = false,
      claimLeaseMs: Long = 30L * 60 * 1000): Result = {
    // same contract as copyInto: the target must be a table, and a
    // zone the producer has not created yet reads as empty (a
    // scheduled loader must not crash on the race)
    require(TxLog.exists(spark, dir),
      s"copyIntoByPrefix: $dir is not TxLog-managed — create the " +
        "table first (CREATE TABLE / TxLog.convert + setTableSchema)")
    val sfs = Compact.fsOf(spark, source)
    if (!sfs.exists(new Path(source)))
      return Result(TxLog.currentVersion(spark, dir), 0, 0L, 0)
    val top = sfs.listStatus(new Path(source)).toSeq
      .filterNot(_.getPath.getName.startsWith("_"))
      .filterNot(_.getPath.getName.startsWith("."))
    val prefixes = top.filter(_.isDirectory)
      .map(st => sfs.makeQualified(st.getPath).toString).sorted
    // executor-side candidate counts: the ONLY zone-wide pass, and it
    // returns one long per prefix — the file names stay distributed
    val confEnts = Compact.confEntries(spark)
    // per prefix: (direct pattern-matching files, non-hidden subdirs).
    // The subdir count exists so a zone nested one level deeper than
    // expected (day=X/hour=Y/part.parquet) RECURSES instead of
    // silently counting 0 files and returning a success receipt that
    // loaded nothing — the scheduled-loader trap
    val counts: Map[String, (Long, Long)] =
      if (prefixes.isEmpty) Map.empty
      else spark.sparkContext
        .parallelize(prefixes, math.max(1, math.min(prefixes.length, 256)))
        .mapPartitions { it =>
          val conf = Compact.confFrom(confEnts)
          // ONE listing per prefix: file and subdir counts both come
          // from it (the pattern matches child NAMES, same contract
          // as the top-level hasTopFiles glob)
          val glob = new org.apache.hadoop.fs.GlobPattern(pattern)
          it.map { p =>
            val fs = new Path(p).getFileSystem(conf)
            var n = 0L
            var dirs = 0L
            fs.listStatus(new Path(p)).foreach { st =>
              val nm = st.getPath.getName
              if (!nm.startsWith("_") && !nm.startsWith(".")) {
                if (st.isDirectory) dirs += 1
                else if (st.isFile && glob.matches(nm)) n += 1
              }
            }
            (p, (n, dirs))
          }
        }.collect().toMap
    // loader-specific walk order spreads racing loaders across
    // prefixes (correctness never depends on it — claims do that)
    val order = scala.util.Random.shuffle(
      prefixes.filter { p =>
        val (n, d) = counts.getOrElse(p, (0L, 0L))
        n > 0L || d > 0L
      })
    // pattern-aware: a stray README at the root must not buy a whole
    // extra listing + ledger + claim pass on every invocation
    val topGlob = new org.apache.hadoop.fs.GlobPattern(pattern)
    val hasTopFiles =
      top.exists(st => st.isFile && topGlob.matches(st.getPath.getName))
    val parts = order.map { p =>
      // a prefix holding subdirectories recurses (one level per call —
      // finite tree, peak driver listing still one prefix's names per
      // level; the recursion's own top-files branch loads p's direct
      // files); a flat prefix loads as its own commit
      if (counts.getOrElse(p, (0L, 0L))._2 > 0L)
        copyIntoByPrefix(spark, dir, p, format, options, pattern, force,
          evolveSchema, claimLeaseMs)
      else copyInto(spark, dir, p, format, options, pattern, force,
        evolveSchema, claimLeaseMs)
    } ++
      (if (hasTopFiles)
        Seq(copyInto(spark, dir, source, format, options, pattern, force,
          evolveSchema, claimLeaseMs))
      else Nil)
    Result(
      version = TxLog.currentVersion(spark, dir),
      filesLoaded = parts.map(_.filesLoaded).sum,
      rowsLoaded = parts.map(_.rowsLoaded).sum,
      filesSkipped = parts.map(_.filesSkipped).sum)
  }

  /** Load every `pattern`-matching file under `source` that no prior
    * load committed, as ONE atomic commit; return the receipt.
    * `force` re-loads everything the listing matches (appending — the
    * deliberate-duplication escape hatch Delta's COPY INTO FORCE
    * documents) while still recording the shard, so later non-force
    * runs skip those files. Formats: csv / json (parsed INTO the
    * table's pinned logical schema — no inferSchema pass over the
    * batch, the reference's `pd.read_csv` inference hazard SURVEY
    * §1.1 flags), parquet (projected and cast to the pinned schema by
    * name). Hidden files (`_`/`.` prefixes) are never candidates.
    */
  def copyInto(
      spark: SparkSession,
      dir: String,
      source: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty,
      pattern: String = "*",
      force: Boolean = false,
      evolveSchema: Boolean = false,
      claimLeaseMs: Long = 30L * 60 * 1000): Result = {
    require(TxLog.exists(spark, dir),
      s"copyInto: $dir is not TxLog-managed — create the table first " +
        "(CREATE TABLE / TxLog.convert + setTableSchema)")
    val sfs = Compact.fsOf(spark, source)
    val listedSt = Option(sfs.globStatus(new Path(source, pattern)))
      .map(_.toSeq).getOrElse(Nil)
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    val listed = listedSt
      .map(st => sfs.makeQualified(st.getPath).toString).sorted
    // zero-byte files (a producer's empty flush) are decided at the
    // LISTING, for every format: they carry no rows and for
    // parquet/json not even a parsable header, so they enter the
    // ledger as consumed without ever being read — otherwise a
    // single empty parquet file wedges the zone (unable to read
    // schema → abort → never ledgered → re-fail every run)
    val zeroByte: Set[String] = listedSt.filter(_.getLen == 0)
      .map(st => sfs.makeQualified(st.getPath).toString).toSet
    val done =
      if (force) Set.empty[String] else ingestedFiles(spark, dir).toSet
    val candidates = listed.filterNot(done)
    val id = java.util.UUID.randomUUID.toString
    // multi-loader handshake (skipped under force — deliberate
    // re-loading has no exactly-once story to defend): keep only the
    // files THIS loader's claims won; a racing loader on the same
    // pattern holds the rest and loads them itself
    val fresh =
      if (force) candidates
      else claimFresh(spark, dir, id, candidates, claimLeaseMs)
    if (fresh.isEmpty)
      return Result(TxLog.currentVersion(spark, dir), 0, 0L, listed.size)
    // claims release on EVERY exit: after a landed commit the ledger
    // shard answers dedup (the claim is residue), and after any
    // failure the files must be reclaimable immediately, not after a
    // lease
    var evolveLocked = false
    try {

    // the pinned LOGICAL schema drives the scan; identity columns a
    // feed omits arrive as NULL (csv/json absent fields) and fill
    val logical = TxLog.read(spark, dir).schema
    val reader = spark.read.options(options)
    import org.apache.spark.sql.functions.{col, lit}
    // parquet feeds may EVOLVE the table (`evolveSchema = true`):
    // batch-only columns widen the pin from this commit on, old rows
    // read NULL — the COPY INTO mergeSchema contract. csv/json parse
    // schema-DRIVEN (they cannot discover columns), so they refuse.
    var evolvedTo: Option[org.apache.spark.sql.types.StructType] = None
    val dataFiles = fresh.filterNot(zeroByte)
    val raw = if (dataFiles.isEmpty)
      // the whole batch was empty flushes: commit the (empty) load so
      // the ledger remembers the files
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logical)
    else format.toLowerCase match {
      case "csv" =>
        require(!evolveSchema,
          "copyInto: csv parses schema-driven and cannot discover new " +
            "columns — evolveSchema applies to parquet feeds only")
        if (!options.get("header").exists(_.equalsIgnoreCase("true")))
          // headerless: the pinned column order IS the file layout
          // (positional by contract)
          reader.schema(logical).csv(dataFiles: _*)
        else {
          // header mode maps by NAME, never position: Spark's
          // user-schema csv read is POSITIONAL (enforceSchema), so
          // naively pinning the table schema onto a feed whose file
          // spells fewer/reordered columns would silently shift every
          // value. And a single BATCH may mix header orders (two
          // producers, or a reorder between waves one run picks up) —
          // one schema inferred from the first file and applied
          // positionally to all would shift the others' values. So:
          // GROUP the files by identical raw header line (one small
          // distributed read per fresh file — the batch is already
          // O(files) to list), parse names once per distinct header
          // via Spark's own csv header resolution (honors sep/quote/
          // charset options), run one schema-driven read per group,
          // and union the groups in pinned column order.
          // ship the session conf: a bare executor-side Configuration
          // would drop credentials/fs bindings and fail header-mode
          // COPY INTO on any non-default filesystem
          val confEnts = Compact.confEntries(spark)
          val headerOf: Map[String, (String, Boolean)] = spark.sparkContext
            .parallelize(fresh,
              math.max(1, math.min(fresh.length, 64)))
            .map { f =>
              val p = new Path(f)
              val hfs = p.getFileSystem(Compact.confFrom(confEnts))
              val in = hfs.open(p)
              try {
                // raw bytes to the first \n (1 MiB cap), decoded
                // byte-preserving — an EQUIVALENCE key for grouping,
                // not a parse; identical headers yield identical
                // prefixes under any charset or quoting
                val buf = new java.io.ByteArrayOutputStream()
                var b = in.read()
                val empty = b < 0 // zero-byte file
                while (b >= 0 && b != '\n' && buf.size < (1 << 20)) {
                  buf.write(b); b = in.read()
                }
                f -> ((new String(buf.toByteArray,
                  java.nio.charset.StandardCharsets.ISO_8859_1), empty))
              } finally in.close()
            }.collect().toMap
          // zero-byte files (producers routinely emit them) carry no
          // rows and no header to probe: they ingest as nothing but
          // still enter the ledger so no later run re-lists them. A
          // NON-empty file whose header line is empty is garbage —
          // refuse naming it rather than let schema inference throw
          val nonEmpty = fresh.filterNot(f => headerOf(f)._2)
          nonEmpty.find(f => headerOf(f)._1.isEmpty).foreach { f =>
            throw new IllegalArgumentException(
              s"copyInto: csv file $f has an empty header line")
          }
          val groups = nonEmpty.groupBy(f => headerOf(f)._1).values.toSeq
            .map(_.sorted).sortBy(_.head)
          val have = logical.fieldNames.toSet
          val parts = groups.map { files =>
            val names = spark.read.options(options)
              .csv(files.head).schema.fieldNames.toSeq
            require(names.distinct.size == names.size,
              s"copyInto: csv header of ${files.head} repeats a " +
                s"column (${names.mkString(", ")})")
            val unknown = names.filterNot(have)
            require(unknown.isEmpty,
              s"copyInto: csv feed ${files.head} carries columns the " +
                s"table lacks (${unknown.mkString(", ")}) — csv " +
                "cannot evolve the schema; align the feed")
            val fileSchema = org.apache.spark.sql.types.StructType(
              names.map(n => logical(n)))
            val df = reader.schema(fileSchema).csv(files: _*)
            val batchNames = names.toSet
            logical.fieldNames.filterNot(batchNames)
              .foldLeft(df)((d, n) =>
                d.withColumn(n, lit(null).cast(logical(n).dataType)))
              .select(logical.fieldNames.toSeq.map(col): _*)
          }
          if (parts.isEmpty) // every fresh file was zero-byte
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              logical)
          else parts.reduce(_.unionByName(_))
        }
      case "json" =>
        require(!evolveSchema,
          "copyInto: json parses schema-driven and cannot discover new " +
            "columns — evolveSchema applies to parquet feeds only")
        reader.schema(logical).json(dataFiles: _*)
      case "parquet" =>
        val df = reader.parquet(dataFiles: _*)
        val haveNames = logical.fieldNames.toSet
        val freshCols = df.schema.fields.filterNot(f => haveNames(f.name))
        val batchNames = df.columns.toSet
        // pinned columns the batch lacks read NULL (identity/default
        // fill then applies) — the usual narrower-feed shape, incl.
        // a pre-evolution producer still writing the old width. ONE
        // fill used by both the plain and the evolve path (which
        // fills against the pin re-read under the lock).
        def nullFill(
            base: org.apache.spark.sql.DataFrame,
            sc: org.apache.spark.sql.types.StructType) =
          sc.fieldNames.filterNot(batchNames)
            .foldLeft(base)((d, n) =>
              d.withColumn(n, lit(null).cast(sc(n).dataType)))
        if (freshCols.isEmpty)
          nullFill(df, logical).select(logical.fields.toSeq.map(f =>
            col(f.name).cast(f.dataType)): _*)
        else {
          require(evolveSchema,
            s"copyInto: batch carries columns the table lacks " +
              s"(${freshCols.map(_.name).mkString(", ")}) — pass " +
              "evolveSchema = true to widen, or align the feed")
          // evolution serializes: without the lock, two evolving
          // loaders would race the version-keyed pin slot (second
          // setTableSchema overwrites the first; a failure
          // retraction could delete the survivor's pin)
          acquireEvolveLock(spark, dir, id, claimLeaseMs)
          evolveLocked = true
          // re-resolve the pin UNDER the lock: an evolution that
          // landed between our first schema read and the lock must
          // be widened OVER, not overwritten away
          val logical2 = TxLog.read(spark, dir).schema
          val have2 = logical2.fieldNames.toSet
          val fresh2 = df.schema.fields.filterNot(f => have2(f.name))
          val merged0 = org.apache.spark.sql.types.StructType(
            logical2.fields ++ fresh2)
          // mapped tables give evolved-in columns FRESH physical
          // names (a re-added dropped name must not resurrect dead
          // values out of old footers)
          val merged =
            if (ColumnMapping.isMapped(logical2))
              ColumnMapping.carryOver(spark, dir, merged0, logical2,
                TxLog.currentVersion(spark, dir) + 1)
            else merged0
          evolvedTo = Some(merged)
          nullFill(df, logical2).select(merged.fields.toSeq.map(f =>
            col(f.name).cast(f.dataType)): _*)
        }
      case other => throw new IllegalArgumentException(
        s"copyInto: unsupported format '$other' (csv, json, parquet)")
    }
    // a schema-driven csv/json read MATERIALIZES a GENERATED ALWAYS
    // identity column the feed omits (all-NULL) — that is the omitted
    // shape, not an explicit insert, so drop it and assign fresh; any
    // real supplied value keeps the column and maybeAssign refuses.
    // Cost: one column-pruned count over the batch, only on ALWAYS
    // tables whose batch carries the column.
    val pre = IdentityColumns.fullSpec(spark, dir) match {
      case Some(sp)
          if !sp.allowExplicit && raw.columns.contains(sp.column) =>
        val supplied = raw.agg(org.apache.spark.sql.functions
          .count(org.apache.spark.sql.functions.col(sp.column)))
          .collect()(0).getLong(0)
        if (supplied == 0) raw.drop(sp.column) else raw
      case _ => raw
    }
    val assigned = GeneratedColumns.fill(spark, dir,
      DefaultColumns.fill(spark, dir,
        IdentityColumns.maybeAssign(spark, dir, pre.toDF())))
    TxLog.enforceConstraints(spark, dir, assigned)

    val tfs = Compact.fsOf(spark, dir)
    val stage = new Path(dir, s".copyinto_stage-$id")
    tfs.delete(stage, true)
    TxLog.stagePhysical(spark, dir, assigned, pinOverride = evolvedTo)
      .write.mode("overwrite").parquet(stage.toString)
    val names = tfs.listStatus(stage).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).sorted
    // loaded-row count from staged footers: metadata pages only, no
    // second scan of the batch, distributed like filesMeta (a serial
    // driver loop over hundreds of staged files would stall the load)
    val stagedPaths = names.map(n => new Path(stage, n).toString)
    val rows = Compact.footerRowCounts(spark, stagedPaths).values.sum
    // ledger BEFORE the files move and the commit lands — see the
    // exactly-once anatomy in the object doc
    TxLog.metaWrite(spark, dir, s"$ShardPrefix$id.txt",
      fresh.mkString("\n"))
    names.foreach { n =>
      if (!tfs.rename(new Path(stage, n), new Path(dir, n)))
        throw new java.io.IOException(s"copyInto: cannot move $n into $dir")
    }
    tfs.delete(stage, true)
    // the widened pin writes BEFORE the commit, keyed to the version
    // about to land: pinning after would open a crash window where
    // the batch's files are ledger-committed (never re-ingested) but
    // the pin never widened — on a mapped table the evolved column's
    // fresh physical name then reads NULL forever. A pin on a
    // version nobody landed yet is inert for every existing snapshot;
    // if the commit retries past it (a concurrent writer took the
    // version), newest-pin-≤-v semantics still cover the landing
    // commit, the interleaved versions merely show the wider schema
    // a commit early (new column all-NULL — benign). On commit
    // FAILURE the pin is retracted; a crash leaves at worst that
    // same benign pre-widen, never unreadable data.
    val pinnedAt = evolvedTo.map { m =>
      val at = TxLog.currentVersion(spark, dir) + 1
      TxLog.setTableSchema(spark, dir, m, at)
      at
    }
    val v =
      try TxLog.commit(spark, dir, adds = names, removes = Nil,
        txn = Some(txnOf(id)), op = Some(s"copy-into(${fresh.size} files)"))
      catch {
        case e: Throwable =>
          // content-guarded retraction: delete the slot only if it
          // still holds OUR schema — a concurrent DDL's pin landing
          // at the same version must survive this rollback
          pinnedAt.foreach(at => TxLog.unsetTableSchema(spark, dir, at,
            expected = evolvedTo))
          throw e
      }
    Result(v, fresh.size, rows, listed.size - fresh.size)

    } finally {
      if (evolveLocked) releaseEvolveLock(spark, dir, id)
      if (!force) releaseClaims(spark, dir, fresh, id)
    }
  }
}
