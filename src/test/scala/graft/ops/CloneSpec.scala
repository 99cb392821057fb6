package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zero-copy shallow clone ([[TxLog.cloneTo]]): metadata-only create,
  * source/clone divergence, localize-on-write through every rewrite
  * path (CoW, DV attach, MOR upsert, materialize), inherited deletion
  * vectors, vacuum containment, clone-of-clone, partitioned sources,
  * config travel.
  */
class CloneSpec extends SparkSpec {

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("clone_src").toString + "/t"
    orders.repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey").write.parquet(dir)
    TxLog.convert(spark, dir)
    dir
  }

  private def cloneDir(): String =
    Files.createTempDirectory("clone_dst").toString + "/c"

  /** (relative name, length, mtime) of every visible data file — the
    * untouched-bytes assertion for the source side.
    */
  private def fileState(dir: String): Set[(String, Long, Long)] = {
    val fs = Compact.fsOf(spark, dir)
    Compact.dataFileStatusesRecursive(fs, dir)
      .map { case (n, st) => (n, st.getLen, st.getModificationTime) }.toSet
  }

  private def dataFiles(dir: String): Set[String] =
    Compact.dataFilesRecursive(Compact.fsOf(spark, dir), dir).toSet

  test("clone is one metadata commit: no data files copied, snapshot equal") {
    val src = freshTable()
    val dst = cloneDir()
    val v = TxLog.cloneTo(spark, src, dst)
    assert(v == 0)
    assert(dataFiles(dst).isEmpty) // zero bytes copied
    assert(same(TxLog.snapshot(spark, dst), orders))
    assert(TxLog.cloneSource(spark, dst).exists(_._2 == 0))
    // history says what happened
    val op = TxLog.history(spark, dst).filter(col("version") === 0)
      .select("operation").head().getString(0)
    assert(op.startsWith("clone("))
  }

  test("clone pins a version: source commits after the clone are invisible") {
    val src = freshTable()
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    TxLog.append(spark, src, orders.limit(10))
    assert(same(TxLog.snapshot(spark, dst), orders))
    assert(TxLog.snapshot(spark, src).count() == orders.count() + 10)
  }

  test("clone writes never touch the source; source stays byte-identical") {
    val src = freshTable()
    val before = fileState(src)
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    // CoW delete, DV delete, MOR upsert, append — every write family
    DeleteWhere.range(spark, dst, "o_orderkey", 1, 30)
    DeletionVectors.delete(spark, dst, col("o_orderkey") === 40)
    val k = orders.filter(col("o_orderkey") > 40)
      .agg(min("o_orderkey")).head().getAs[Number](0).longValue()
    DeletionVectors.upsert(spark, dst,
      orders.filter(col("o_orderkey") === k)
        .withColumn("o_orderpriority", lit("cloned-edit")),
      keyCols = Seq("o_orderkey"))
    TxLog.append(spark, dst, orders.limit(5))
    assert(fileState(src) == before)
    assert(same(TxLog.snapshot(spark, src), orders))
    // and the clone's state is exactly the composed edits
    val expected = orders
      .filter(!col("o_orderkey").between(1, 30))
      .filter(col("o_orderkey") =!= 40)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") === k, lit("cloned-edit"))
          .otherwise(col("o_orderpriority")))
      .unionByName(orders.limit(5))
    assert(same(TxLog.snapshot(spark, dst), expected))
  }

  test("CoW rewrite localizes: touched entries land under the clone root") {
    val src = freshTable()
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    val r = DeleteWhere.range(spark, dst, "o_orderkey", 1, 20)
    assert(r.deletedRows == orders.filter(col("o_orderkey").between(1, 20)).count())
    assert(r.untouched > 0) // pruning still works through the clone
    // replacement files are REAL local files now
    assert(dataFiles(dst).nonEmpty)
    assert(same(TxLog.snapshot(spark, dst),
      orders.filter(!col("o_orderkey").between(1, 20))))
    // v0 (all-based) still reconstructs: time travel across the clone
    assert(same(TxLog.snapshot(spark, dst, 0), orders))
  }

  test("DV delete on a clone writes a LOCAL sidecar; source _dv untouched") {
    val src = freshTable()
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    DeletionVectors.delete(spark, dst, col("o_orderkey") <= 25)
    val fs = Compact.fsOf(spark, dst)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dst, "_dv")))
    assert(!Compact.fsOf(spark, src)
      .exists(new org.apache.hadoop.fs.Path(src, "_dv")))
    assert(same(TxLog.snapshot(spark, dst),
      orders.filter(col("o_orderkey") > 25)))
    // materialize folds the vectors into LOCAL files; still no source write
    val before = fileState(src)
    DeletionVectors.materialize(spark, dst)
    assert(fileState(src) == before)
    assert(same(TxLog.snapshot(spark, dst),
      orders.filter(col("o_orderkey") > 25)))
  }

  test("cloning a DV-carrying table inherits its vectors; re-delete merges locally") {
    val src = freshTable()
    DeletionVectors.delete(spark, src, col("o_orderkey") <= 15)
    val srcSidecars = {
      val fs = Compact.fsOf(spark, src)
      fs.listStatus(new org.apache.hadoop.fs.Path(src, "_dv"))
        .map(s => (s.getPath.getName, s.getModificationTime)).toSet
    }
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    // the inherited vector applies through the clone read
    assert(same(TxLog.snapshot(spark, dst),
      orders.filter(col("o_orderkey") > 15)))
    // a further delete merges prior positions into a LOCAL sidecar
    DeletionVectors.delete(spark, dst, col("o_orderkey") <= 30)
    assert(same(TxLog.snapshot(spark, dst),
      orders.filter(col("o_orderkey") > 30)))
    // resurrect check: the rows hidden before the clone stay hidden
    assert(TxLog.snapshot(spark, dst)
      .filter(col("o_orderkey") <= 15).count() == 0)
    // source sidecars untouched, source state untouched
    val fsS = Compact.fsOf(spark, src)
    assert(fsS.listStatus(new org.apache.hadoop.fs.Path(src, "_dv"))
      .map(s => (s.getPath.getName, s.getModificationTime)).toSet == srcSidecars)
    assert(same(TxLog.snapshot(spark, src),
      orders.filter(col("o_orderkey") > 15)))
  }

  test("vacuum on the clone never deletes source files") {
    val src = freshTable()
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    // churn the clone so old local generations exist
    DeleteWhere.range(spark, dst, "o_orderkey", 1, 10)
    DeleteWhere.range(spark, dst, "o_orderkey", 11, 20)
    val before = fileState(src)
    val deleted = TxLog.vacuum(spark, dst, retainVersions = 1)
    assert(fileState(src) == before)
    assert(deleted >= 1) // the superseded local generation goes
    assert(same(TxLog.snapshot(spark, dst),
      orders.filter(!col("o_orderkey").between(1, 20))))
  }

  test("clone of a clone points at the ORIGINAL roots, not a chain") {
    val src = freshTable()
    val c1 = cloneDir()
    TxLog.cloneTo(spark, src, c1)
    DeleteWhere.range(spark, c1, "o_orderkey", 1, 10) // localize a few
    val c2 = cloneDir()
    TxLog.cloneTo(spark, c1, c2)
    assert(same(TxLog.snapshot(spark, c2),
      orders.filter(!col("o_orderkey").between(1, 10))))
    // c2's entries base on src (inherited) or c1 (localized) — never
    // transitively through a missing middle: drop c1's LOG entirely
    // and c2 still reads (bases are absolute roots, not a chain of
    // log lookups). Data files of c1 must survive, so only the log
    // dir goes.
    val fs = Compact.fsOf(spark, c1)
    fs.delete(new org.apache.hadoop.fs.Path(c1, "_txlog"), true)
    assert(same(TxLog.snapshot(spark, c2),
      orders.filter(!col("o_orderkey").between(1, 10))))
  }

  test("hive-partitioned source: partition columns and pruning survive the clone") {
    val base = Files.createTempDirectory("clone_hive").toString + "/t"
    orders.withColumn("bucket", pmod(col("o_orderkey"), lit(4)))
      .write.partitionBy("bucket").parquet(base)
    TxLog.convert(spark, base)
    val dst = cloneDir()
    TxLog.cloneTo(spark, base, dst)
    val snap = TxLog.snapshot(spark, dst)
    assert(snap.columns.contains("bucket"))
    assert(snap.filter(col("bucket") === 2).count() ==
      orders.filter(pmod(col("o_orderkey"), lit(4)) === 2).count())
    // a partition-scoped CoW delete stays partition-scoped on the clone
    val r = DeleteWhere.where(spark, dst,
      col("bucket") === 1 && col("o_orderkey") <= 100)
    assert(same(TxLog.snapshot(spark, dst),
      orders.withColumn("bucket", pmod(col("o_orderkey"), lit(4)))
        .filter(!(col("bucket") === 1 && col("o_orderkey") <= 100))))
    assert(r.deletedRows ==
      orders.filter(pmod(col("o_orderkey"), lit(4)) === 1 &&
        col("o_orderkey") <= 100).count())
  }

  test("config travels: constraints, stats columns and the schema pin") {
    val src = freshTable()
    TxLog.setStatsColumns(spark, src, Seq("o_orderkey"))
    TxLog.setCheckConstraints(spark, src, Seq("o_totalprice >= 0"))
    TxLog.setTableSchema(spark, src, TxLog.snapshot(spark, src).schema)
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    assert(TxLog.statsColumns(spark, dst) == Seq("o_orderkey"))
    assert(TxLog.checkConstraints(spark, dst) == Seq("o_totalprice >= 0"))
    assert(TxLog.tableSchema(spark, dst).isDefined)
    // the constraint actually enforces in the clone
    intercept[TxLog.ConstraintViolation] {
      TxLog.append(spark, dst,
        orders.limit(1).withColumn("o_totalprice", lit(-5.0)))
    }
    // and fresh stats collect on local appends (based entries carry
    // the source's; clone-local files get their own)
    TxLog.append(spark, dst, orders.limit(7))
    val appended = TxLog.liveEntries(spark, dst).filter(_.base.isEmpty)
    assert(appended.nonEmpty &&
      appended.forall(_.stats.exists(_.column == "o_orderkey")))
  }

  test("binPack on a clone packs only LOCAL files; based entries ride through") {
    val src = freshTable()
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    TxLog.append(spark, dst, orders.limit(3).repartition(2))
    TxLog.append(spark, dst, orders.limit(2).repartition(2))
    val srcBefore = fileState(src)
    Compact.binPack(spark, dst, targetBytes = 1L << 30, smallBytes = 1L << 30)
    assert(fileState(src) == srcBefore)
    val live = TxLog.liveEntries(spark, dst)
    assert(live.count(_.base.isDefined) == 8)  // all based entries intact
    assert(live.count(_.base.isEmpty) == 1)    // 4 local tails packed to 1
    assert(same(TxLog.snapshot(spark, dst),
      orders.unionByName(orders.limit(3)).unionByName(orders.limit(2))))
  }

  test("checkpoint + diff + restore round-trip based entries") {
    val src = freshTable()
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    DeleteWhere.range(spark, dst, "o_orderkey", 1, 10)
    TxLog.checkpoint(spark, dst) // serializes base/dvBase segments
    TxLog.append(spark, dst, orders.limit(5))
    // fold-from-checkpoint reads based entries correctly
    assert(same(TxLog.snapshot(spark, dst),
      orders.filter(!col("o_orderkey").between(1, 10))
        .unionByName(orders.limit(5))))
    // row-level diff across the localizing rewrite: only deletes
    val d = TxLog.diff(spark, dst, 0, 1)
    assert(d.filter(col("_change_type") === "insert").count() == 0)
    assert(d.filter(col("_change_type") === "delete").count() ==
      orders.filter(col("o_orderkey").between(1, 10)).count())
    // restore to the all-based v0
    TxLog.restore(spark, dst, 0)
    assert(same(TxLog.snapshot(spark, dst), orders))
  }

  test("filesMeta and export manifests resolve based entries") {
    val src = freshTable()
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    val meta = TxLog.filesMeta(spark, dst)
    assert(meta.count() == 8)
    assert(meta.agg(sum("rows")).head().getLong(0) == orders.count())
    val n = SnapshotExport.symlinkManifest(spark, dst)
    assert(n == 8)
    // an external engine (plain spark.read over the manifest list)
    // sees the snapshot
    val listed = SnapshotExport.manifestFiles(spark, dst)
    assert(listed.size == 8 && listed.forall(_.contains("clone_src")))
    assert(same(spark.read.parquet(listed: _*), orders))
  }

  test("localize detaches: vectors fold, partition tree survives, source deletable") {
    val base = Files.createTempDirectory("clone_detach").toString + "/t"
    orders.withColumn("bucket", pmod(col("o_orderkey"), lit(4)))
      .write.partitionBy("bucket").parquet(base)
    TxLog.convert(spark, base)
    DeletionVectors.delete(spark, base, col("o_orderkey") <= 30) // pre-clone DV
    val dst = cloneDir()
    TxLog.cloneTo(spark, base, dst)
    TxLog.append(spark, dst, // a local file localize must NOT recopy
      orders.limit(2).withColumn("bucket", pmod(col("o_orderkey"), lit(4))))
    val r = TxLog.localize(spark, dst)
    assert(r.alreadyLocal >= 1 && r.localized >= 4 && r.bytesCopied > 0)
    assert(TxLog.liveEntries(spark, dst).forall(_.base.isEmpty))
    assert(TxLog.liveEntries(spark, dst).forall(_.dvBase.isEmpty))
    // partition column survives the detach copy
    assert(TxLog.snapshot(spark, dst).columns.contains("bucket"))
    // the source can now vanish entirely
    val fs = Compact.fsOf(spark, base)
    fs.delete(new org.apache.hadoop.fs.Path(base).getParent, true)
    assert(same(TxLog.snapshot(spark, dst).drop("bucket"),
      orders.filter(col("o_orderkey") > 30).unionByName(orders.limit(2))))
    // idempotent: a second localize copies nothing
    val r2 = TxLog.localize(spark, dst)
    assert(r2.localized == 0 && r2.bytesCopied == 0)
  }

  test("pinSource: the cloned version survives aggressive source vacuum") {
    val src = freshTable()
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst, pinSource = true)
    assert(TxLog.tags(spark, src).keys.exists(_.startsWith("clone.")))
    // churn + hard vacuum on the source: without the pin this would
    // reclaim v0's files out from under the clone
    DeleteWhere.range(spark, src, "o_orderkey", 1, 3000)
    DeleteWhere.range(spark, src, "o_orderkey", 3001, 6000)
    TxLog.vacuum(spark, src, retainVersions = 1)
    assert(same(TxLog.snapshot(spark, dst), orders)) // clone intact
    // detach, drop the pin, vacuum again: now the bytes reclaim
    TxLog.localize(spark, dst)
    val tag = TxLog.tags(spark, src).keys.find(_.startsWith("clone.")).get
    TxLog.deleteTag(spark, src, tag)
    val reclaimed = TxLog.vacuum(spark, src, retainVersions = 1)
    assert(reclaimed > 0)
    assert(same(TxLog.snapshot(spark, dst), orders))
  }

  test("SQL surface: graft_clone at a tag with 'pin'") {
    graft.GraftExtensions.installInto(spark)
    val src = freshTable()
    TxLog.setTag(spark, src, "release")              // pins v0
    TxLog.append(spark, src, orders.limit(5))        // v1 after the tag
    val dst = cloneDir()
    val r = spark.sql(
      s"SELECT * FROM graft_clone('$src', '$dst', 'release', 'pin')")
      .collect().head
    assert(r.getAs[Long]("entries") == 8)
    assert(same(TxLog.snapshot(spark, dst), orders)) // the TAGGED state
    assert(TxLog.tags(spark, src).keys.exists(_.startsWith("clone.")))
    assert(TxLog.cloneSource(spark, dst).exists(_._2 == 0))
  }

  test("Maintenance(localizeClones) detaches, folds, packs in one pass") {
    val src = freshTable()
    DeletionVectors.delete(spark, src, col("o_orderkey") <= 10)
    val dst = cloneDir()
    TxLog.cloneTo(spark, src, dst)
    val r = Maintenance.run(spark, dst, localizeClones = true,
      retainVersions = 1)
    assert(r.localizedFiles == 8)
    assert(TxLog.liveEntries(spark, dst).forall(e =>
      e.base.isEmpty && e.dvBase.isEmpty))
    assert(same(TxLog.snapshot(spark, dst),
      orders.filter(col("o_orderkey") > 10)))
    // default run stays zero-copy
    val dst2 = cloneDir()
    TxLog.cloneTo(spark, src, dst2)
    val r2 = Maintenance.run(spark, dst2)
    assert(r2.localizedFiles == 0 &&
      TxLog.liveEntries(spark, dst2).exists(_.base.isDefined))
  }

  test("guard rails: no clone onto a managed/occupied path, no self-clone") {
    val src = freshTable()
    intercept[IllegalArgumentException] {
      TxLog.cloneTo(spark, src, src)
    }
    val occupied = Files.createTempDirectory("clone_occ").toString + "/t"
    orders.limit(1).write.parquet(occupied)
    intercept[IllegalArgumentException] {
      TxLog.cloneTo(spark, src, occupied)
    }
  }
}
