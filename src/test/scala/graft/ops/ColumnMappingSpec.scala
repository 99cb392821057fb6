package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column mapping ([[ColumnMapping]]): metadata-only RENAME/DROP with
  * physical-name indirection — enable freezes current names, rename
  * changes only the pin, drop + re-add never resurrects, every write
  * path (append, CoW delete, MOR upsert, compact, streaming-shaped
  * staged appends) spells physical names on disk, reads stay logical,
  * ADD-carried stats keep pruning across renames, time travel keeps
  * each version's own names.
  */
class ColumnMappingSpec extends SparkSpec {

  private def freshTable(rows: Int = 100): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("colmap").toString + "/t"
    (0 until rows).map(i => (i.toLong, s"name_$i", i * 10.0))
      .toDF("id", "label", "amount")
      .repartition(4).write.parquet(dir)
    TxLog.convert(spark, dir)
    dir
  }

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  test("enable is metadata-only and idempotent") {
    val dir = freshTable()
    val before = TxLog.snapshot(spark, dir).orderBy("id").collect().toSeq
    val fs = Compact.fsOf(spark, dir)
    val mtimes = Compact.dataFileStatusesRecursive(fs, dir)
      .map { case (n, st) => (n, st.getModificationTime) }.toSet
    val pin1 = ColumnMapping.enable(spark, dir)
    val pin2 = ColumnMapping.enable(spark, dir)
    assert(ColumnMapping.isMapped(pin1) && pin1 == pin2)
    assert(Compact.dataFileStatusesRecursive(fs, dir)
      .map { case (n, st) => (n, st.getModificationTime) }.toSet == mtimes)
    assert(TxLog.snapshot(spark, dir).orderBy("id").collect().toSeq == before)
  }

  test("rename is metadata-only; values intact; time travel keeps old name") {
    val dir = freshTable()
    val before = TxLog.snapshot(spark, dir)
      .select(col("amount")).as[Double](spark.implicits.newDoubleEncoder)
      .collect().sorted.toSeq
    val vRename = ColumnMapping.renameColumn(spark, dir, "amount", "total")
    val now = TxLog.snapshot(spark, dir)
    assert(now.columns.toSeq == Seq("id", "label", "total"))
    assert(now.select(col("total")).as[Double](spark.implicits.newDoubleEncoder)
      .collect().sorted.toSeq == before)
    // time travel below the rename reads the OLD logical name
    val old = TxLog.snapshot(spark, dir, vRename - 1)
    assert(old.columns.toSeq == Seq("id", "label", "amount"))
    // and the rename cannot shadow an existing name
    intercept[IllegalArgumentException] {
      ColumnMapping.renameColumn(spark, dir, "label", "total")
    }
  }

  test("every write path spells physical names after a rename") {
    import spark.implicits._
    val dir = freshTable()
    ColumnMapping.renameColumn(spark, dir, "amount", "total")
    // append (logical frame in)
    TxLog.append(spark, dir,
      Seq((1000L, "name_1000", 42.0)).toDF("id", "label", "total"))
    // MOR upsert
    DeletionVectors.upsert(spark, dir,
      Seq((0L, "renamed_zero", 999.0)).toDF("id", "label", "total"),
      keyCols = Seq("id"))
    // CoW update + delete through the generic-predicate paths
    DeleteWhere.updateWhere(spark, dir, col("id") === 1L,
      Seq("total" -> lit(111.0)))
    DeleteWhere.wherePruned(spark, dir, col("id") === 2L)
    // compact everything into one era
    Compact.binPack(spark, dir, targetBytes = 1L << 30, smallBytes = 1L << 30)
    val got = TxLog.snapshot(spark, dir)
    assert(got.columns.toSeq == Seq("id", "label", "total"))
    assert(got.count() == 100L) // 100 - 1 deleted + 1 appended
    assert(got.filter(col("id") === 0L).head().getDouble(2) == 999.0)
    assert(got.filter(col("id") === 1L).head().getDouble(2) == 111.0)
    assert(got.filter(col("id") === 2L).isEmpty)
    assert(got.filter(col("id") === 1000L).head().getDouble(2) == 42.0)
    // on disk, EVERY live file spells the physical name (amount),
    // never the logical one (total)
    TxLog.liveFiles(spark, dir).foreach { n =>
      val footer = spark.read.parquet(s"$dir/$n").schema.fieldNames.toSet
      assert(footer.contains("amount") && !footer.contains("total"),
        s"$n spells $footer")
    }
  }

  test("drop + re-add of the same name does not resurrect old values") {
    import spark.implicits._
    val dir = freshTable(10)
    ColumnMapping.enable(spark, dir)
    ColumnMapping.dropColumn(spark, dir, "amount")
    assert(TxLog.snapshot(spark, dir).columns.toSeq == Seq("id", "label"))
    ColumnMapping.addColumn(spark, dir,
      org.apache.spark.sql.types.StructField("amount",
        org.apache.spark.sql.types.DoubleType, nullable = true))
    // pre-drop rows read NULL — the old column's bytes stay dead
    val re = TxLog.snapshot(spark, dir)
    assert(re.columns.toSeq == Seq("id", "label", "amount"))
    assert(re.filter(col("amount").isNotNull).count() == 0L)
    // new writes land in the FRESH physical column and read back
    TxLog.append(spark, dir, Seq((99L, "x", 5.5)).toDF("id", "label", "amount"))
    val after = TxLog.snapshot(spark, dir)
    assert(after.filter(col("amount").isNotNull).count() == 1L)
    assert(after.filter(col("id") === 99L).head().getDouble(2) == 5.5)
  }

  test("ADD-carried stats keep pruning across a rename") {
    import spark.implicits._
    val dir = Files.createTempDirectory("colmap").toString + "/t"
    (0 until 1000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.parquet(dir)
    TxLog.convert(spark, dir)
    TxLog.setStatsColumns(spark, dir, Seq("id"))
    // rewrite so entries carry stats, then rename the stats column
    Compact.binPack(spark, dir, targetBytes = 4096, smallBytes = 1L << 30,
      sortCols = Seq("id"))
    val allFiles = TxLog.liveFiles(spark, dir).size
    ColumnMapping.renameColumn(spark, dir, "id", "row_id")
    assert(TxLog.statsColumns(spark, dir) == Seq("row_id"))
    val cand = TxLog.candidateFilesFromLog(spark, dir, "row_id", 0, 10)
    assert(cand.size < allFiles, s"pruning dead: $cand of $allFiles")
    val pruned = TxLog.snapshotPruned(spark, dir, "row_id", 0, 10)
    assert(pruned.count() == 11)
    // and files landing AFTER the rename still carry bounds (the
    // declared list followed the rename)
    TxLog.append(spark, dir, Seq((5000L, 1.0)).toDF("row_id", "v"))
    val post = TxLog.liveEntries(spark, dir).filter(_.stats.nonEmpty)
    assert(post.exists(_.stats.exists(s => s.min == 5000.0)))
    // the post-rename entry keys its stats by the PHYSICAL name
    assert(post.flatMap(_.stats).forall(_.column == "id"))
  }

  test("rename guards: partition and constrained columns refuse") {
    import spark.implicits._
    val dir = Files.createTempDirectory("colmap").toString + "/t"
    graft.plans.GraftDml.sql(spark,
      s"CREATE TABLE parquet.`$dir` (id BIGINT, p STRING, " +
        s"v DOUBLE, CONSTRAINT pos CHECK (v >= 0)) PARTITIONED BY (p)")
    TxLog.append(spark, dir,
      Seq((1L, "a", 2.0)).toDF("id", "p", "v"))
    intercept[IllegalArgumentException] {
      ColumnMapping.renameColumn(spark, dir, "p", "q") // partition col
    }
    intercept[IllegalArgumentException] {
      ColumnMapping.renameColumn(spark, dir, "v", "w") // CHECK references
    }
    // unconstrained, unpartitioned column renames fine
    ColumnMapping.renameColumn(spark, dir, "id", "row_id")
    assert(TxLog.snapshot(spark, dir).columns.sorted.toSeq ==
      Seq("p", "row_id", "v"))
  }

  test("SQL surface: ALTER TABLE RENAME COLUMN, then DML keeps working") {
    import spark.implicits._
    val dir = freshTable()
    graft.GraftExtensions.installInto(spark)
    def ddl(stmt: String) = graft.plans.GraftDml.sql(spark, stmt)
    ddl(s"ALTER TABLE parquet.`$dir` RENAME COLUMN amount TO total")
    assert(TxLog.snapshot(spark, dir).columns.toSeq ==
      Seq("id", "label", "total"))
    ddl(s"UPDATE parquet.`$dir` SET total = total + 1 WHERE id = 3")
    Seq((3L, 31.0)).toDF("k", "t").createOrReplaceTempView("colmap_src")
    ddl(s"""MERGE INTO parquet.`$dir` t USING colmap_src s
      ON t.id = s.k
      WHEN MATCHED THEN UPDATE SET total = s.t * 2
      WHEN NOT MATCHED THEN INSERT (id, total) VALUES (s.k, s.t)""")
    val r = TxLog.snapshot(spark, dir).filter(col("id") === 3L).head()
    assert(r.getDouble(2) == 62.0)
    ddl(s"DELETE FROM parquet.`$dir` WHERE total > 900")
    assert(TxLog.snapshot(spark, dir).count() == 91L) // ids 91..99 gone
    // drop + re-add via SQL gets a fresh physical name (no resurrection)
    ddl(s"ALTER TABLE parquet.`$dir` DROP COLUMN label")
    ddl(s"ALTER TABLE parquet.`$dir` ADD COLUMNS (label STRING)")
    assert(TxLog.snapshot(spark, dir)
      .filter(col("label").isNotNull).count() == 0L)
  }

  test("clone of a mapped table reads logically and diverges freely") {
    import spark.implicits._
    val src = freshTable()
    ColumnMapping.renameColumn(spark, src, "amount", "total")
    val dst = Files.createTempDirectory("colmap_clone").toString + "/c"
    TxLog.cloneTo(spark, src, dst)
    assert(same(TxLog.snapshot(spark, dst), TxLog.snapshot(spark, src)))
    assert(TxLog.snapshot(spark, dst).columns.toSeq ==
      Seq("id", "label", "total"))
    // a rename in the CLONE stays in the clone
    ColumnMapping.renameColumn(spark, dst, "label", "tag")
    assert(TxLog.snapshot(spark, dst).columns.toSeq ==
      Seq("id", "tag", "total"))
    assert(TxLog.snapshot(spark, src).columns.toSeq ==
      Seq("id", "label", "total"))
    // localize (detach) rewrites through the mapping
    TxLog.localize(spark, dst)
    assert(TxLog.snapshot(spark, dst).filter(col("id") === 7L)
      .head().getDouble(2) == 70.0)
  }

  test("CDF across a rename speaks the end version's names") {
    import spark.implicits._
    val dir = freshTable(10)
    val v0 = TxLog.currentVersion(spark, dir)
    TxLog.append(spark, dir, Seq((100L, "a", 1.0)).toDF("id", "label", "amount"))
    ColumnMapping.renameColumn(spark, dir, "amount", "total")
    TxLog.append(spark, dir, Seq((101L, "b", 2.0)).toDF("id", "label", "total"))
    val feed = TxLog.changes(spark, dir, v0,
      TxLog.currentVersion(spark, dir), keyCols = Seq("id"))
    assert(feed.columns.contains("total") && !feed.columns.contains("amount"))
    assert(feed.filter(col("_change_type") === "insert").count() == 2L)
  }

  test("export refuses once physical and logical names diverge") {
    val dir = freshTable(10)
    assert(SnapshotExport.symlinkManifest(spark, dir) > 0L)
    ColumnMapping.renameColumn(spark, dir, "amount", "total")
    intercept[IllegalArgumentException] {
      SnapshotExport.symlinkManifest(spark, dir)
    }
  }

  test("pushdown and pruning survive the mapping projection") {
    import spark.implicits._
    val dir = freshTable(1000)
    ColumnMapping.renameColumn(spark, dir, "amount", "total")
    val df = TxLog.snapshot(spark, dir)
      .filter(col("total") > 500.0).select("id", "total")
    val p = df.queryExecution.executedPlan.toString
    // the logical-name filter reaches the scan as a pushed filter on
    // the PHYSICAL column, and the scan reads only the 2 mapped columns
    assert(p.contains("PushedFilters: [IsNotNull(amount), GreaterThan(amount,500.0)]"), p)
    assert(p.contains("ReadSchema: struct<id:bigint,amount:double>"), p)
    assert(!p.contains("Exchange"), p)
    assert(df.count() == 949L) // ids 51..999
  }

  test("RESTORE below a rename restores the old names with the data") {
    import spark.implicits._
    val dir = freshTable(10)
    val vBefore = TxLog.currentVersion(spark, dir)
    ColumnMapping.renameColumn(spark, dir, "amount", "total")
    TxLog.append(spark, dir, Seq((500L, "x", 1.0)).toDF("id", "label", "total"))
    TxLog.restore(spark, dir, vBefore)
    val got = TxLog.snapshot(spark, dir)
    assert(got.columns.toSeq == Seq("id", "label", "amount")) // old names
    assert(got.count() == 10L) // old rows
    // and the rename can be re-applied afterwards
    ColumnMapping.renameColumn(spark, dir, "amount", "total2")
    assert(TxLog.snapshot(spark, dir).columns.contains("total2"))
  }

  test("a rename on a branch stays on the branch until publish") {
    import spark.implicits._
    val dir = freshTable(10)
    ColumnMapping.enable(spark, dir)
    TxLog.createBranch(spark, dir, "audit")
    TxLog.withBranch(spark, dir, "audit") {
      ColumnMapping.renameColumn(spark, dir, "amount", "audited_amount")
      assert(TxLog.snapshot(spark, dir).columns.contains("audited_amount"))
    }
    // main is untouched pre-publish
    assert(TxLog.snapshot(spark, dir).columns.toSeq ==
      Seq("id", "label", "amount"))
    TxLog.publishBranch(spark, dir, "audit")
    assert(TxLog.snapshot(spark, dir).columns.contains("audited_amount"))
  }

  test("enable refuses a DbLog-shaped root") {
    import spark.implicits._
    val db = Files.createTempDirectory("colmap_db").toString + "/db"
    DbLog.create(spark, db)
    DbLog.transact(spark, db, "seed") { t =>
      t.append("a", Seq((1L, "x")).toDF("id", "v"))
    }
    intercept[IllegalArgumentException] {
      ColumnMapping.enable(spark, db)
    }
  }
}
