package graft.ops

import java.nio.file.Files

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

/** Symlink-manifest export ([[SnapshotExport]]), vacuum dry-run, and
  * restore-by-tag — the operational surface around a snapshot.
  */
class SnapshotExportSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.installInto(spark)

  test("manifest lists exactly the live files; an external-style read equals the snapshot") {
    val dir = Files.createTempDirectory("export").toString + "/t"
    (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(3).write.parquet(dir)
    TxLog.convert(spark, dir)
    UpsertWhere.byKeys(spark, dir, "k", Seq((1L, "up")).toDF("k", "v"))
    val n = SnapshotExport.symlinkManifest(spark, dir)
    val listed = SnapshotExport.manifestFiles(spark, dir)
    assert(listed.size == n.toInt)
    val fs = Compact.fsOf(spark, dir)
    val live = TxLog.liveFiles(spark, dir)
      .map(f => fs.makeQualified(new org.apache.hadoop.fs.Path(dir, f))
        .toString).sorted
    assert(listed == live)
    // what the external engine does: read the listed files directly
    val external = spark.read.parquet(listed: _*)
    assert(external.exceptAll(TxLog.snapshot(spark, dir)).isEmpty &&
      TxLog.snapshot(spark, dir).exceptAll(external).isEmpty)
    // the manifest pins ITS version: a later commit changes the log,
    // not the listed files
    UpsertWhere.byKeys(spark, dir, "k", Seq((2L, "later")).toDF("k", "v"))
    assert(spark.read.parquet(SnapshotExport.manifestFiles(spark, dir): _*)
      .where("v = 'later'").count() == 0)
  }

  test("partitioned layout exports one manifest per partition dir; re-export drops stale ones") {
    val dir = Files.createTempDirectory("export").toString + "/t"
    (1L to 12L).map(k => (k, s"v$k", (k % 3).toInt)).toDF("k", "v", "p")
      .write.partitionBy("p").parquet(dir)
    TxLog.convert(spark, dir)
    SnapshotExport.symlinkManifest(spark, dir)
    val fs = Compact.fsOf(spark, dir)
    val root = new org.apache.hadoop.fs.Path(dir, SnapshotExport.ManifestDir)
    (0 to 2).foreach { p =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(root, s"p=$p/manifest")),
        s"missing per-partition manifest for p=$p")
    }
    // empty one partition, re-export: its manifest must VANISH (a
    // stale listing would feed deleted rows to the external engine)
    DeleteWhere.wherePruned(spark, dir, pmod(col("k"), lit(3)) === 2)
    SnapshotExport.symlinkManifest(spark, dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "p=2/manifest")))
    assert(spark.read.parquet(SnapshotExport.manifestFiles(spark, dir): _*)
      .count() == 8)
  }

  test("DV-carrying snapshots refuse to export until materialized") {
    val dir = Files.createTempDirectory("export").toString + "/t"
    (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(1).write.parquet(dir)
    TxLog.convert(spark, dir)
    DeletionVectors.delete(spark, dir, col("k") <= 3)
    val e = intercept[IllegalArgumentException] {
      SnapshotExport.symlinkManifest(spark, dir)
    }
    assert(e.getMessage.contains("materialize"))
    DeletionVectors.materialize(spark, dir)
    assert(SnapshotExport.symlinkManifest(spark, dir) > 0)
    assert(spark.read.parquet(SnapshotExport.manifestFiles(spark, dir): _*)
      .count() == 7)
  }

  test("SQL procedures: export, vacuum dry-run (nothing touched), restore by tag") {
    val dir = Files.createTempDirectory("export").toString + "/t"
    Seq((0L, "v0")).toDF("k", "v").write.parquet(dir)
    TxLog.convert(spark, dir)
    TxLog.setTag(spark, dir, "release", 0)
    (1 to 5).foreach(i => UpsertWhere.byKeys(spark, dir, "k",
      Seq((0L, s"w$i")).toDF("k", "v")))
    val exp = spark.sql(s"SELECT * FROM graft_export_manifest('$dir')").head()
    assert(exp.getString(0) == "export-manifest" && exp.getLong(2) >= 1)
    val filesBefore = Compact.dataFilesRecursive(
      Compact.fsOf(spark, dir), dir).size
    val dry = spark.sql(s"SELECT * FROM graft_vacuum_dry_run('$dir', 2)").head()
    assert(dry.getString(0) == "vacuum-dry-run" && dry.getLong(2) > 0)
    assert(Compact.dataFilesRecursive(
      Compact.fsOf(spark, dir), dir).size == filesBefore,
      "dry run must not delete anything")
    val r = spark.sql(s"SELECT * FROM graft_restore('$dir', 'release')").head()
    assert(r.getString(0) == "restore")
    assert(TxLog.snapshot(spark, dir).select("v").as[String].head() == "v0")
  }
}
