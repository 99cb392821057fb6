package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Snapshot export for engines that don't speak the log: a
  * symlink-format manifest — the public pattern Delta/Athena use —
  * listing every live data file of one consistent version as a
  * fully-qualified URI, one per line, under
  * `_symlink_format_manifest/`. An external reader (Trino, Presto,
  * Hive, DuckDB over a file list) points its table at the manifest
  * and sees exactly the exported snapshot: later commits change the
  * LOG, not the listed files, and vacuum won't reclaim a file a
  * retained version still references.
  *
  * Hive-partitioned layouts write one manifest per partition
  * directory (`_symlink_format_manifest/p=1/manifest`), so an
  * external partitioned table maps 1:1 and partition pruning keeps
  * working on the other engine.
  *
  * DV-carrying entries REFUSE to export: a manifest lists raw files,
  * so an external reader would resurrect vectored-out rows —
  * [[DeletionVectors.materialize]] first (the same rule the raw-bytes
  * rewrite paths enforce).
  *
  * 100 TB shape: the export is O(live entries) driver-side text — no
  * data read or moved; a 100k-file table is a few MB of manifest.
  */
object SnapshotExport {

  val ManifestDir = "_symlink_format_manifest"

  /** Write (overwrite) the manifest tree for `version` (default:
    * current). Returns the number of data files listed.
    */
  def symlinkManifest(
      spark: SparkSession,
      dir: String,
      version: Int = Int.MaxValue): Long = {
    val entries = TxLog.liveEntries(spark, dir, version)
    val vectored = entries.filter(_.dv.isDefined)
    require(vectored.isEmpty,
      s"export of $dir would list ${vectored.size} file(s) whose deletion " +
        "vectors an external reader cannot apply, resurrecting deleted " +
        "rows — run DeletionVectors.materialize first")
    // same honesty rule for column mapping: a manifest consumer reads
    // raw footers, which spell PHYSICAL names — export only when every
    // physical name still equals its logical name (i.e. no rename or
    // drop-safe re-add has diverged the spellings)
    TxLog.tableSchema(spark, dir, version).foreach { pin =>
      val diverged = pin.fields
        .filter(f => ColumnMapping.physicalName(f) != f.name).map(_.name)
      require(diverged.isEmpty,
        s"export of $dir: column(s) ${diverged.mkString(", ")} have " +
          "physical names differing from their logical names (column " +
          "mapping after a rename/re-add) — an external manifest reader " +
          "would see the physical spelling. CREATE OR REPLACE the table " +
          "to materialize logical names before exporting")
    }
    val fs = Compact.fsOf(spark, dir)
    val root = new Path(dir, ManifestDir)
    // full overwrite: a stale partition manifest from a previous
    // export (partition since emptied) must not survive
    fs.delete(root, true)
    val byPartition = entries.groupBy { e =>
      val i = e.name.lastIndexOf('/')
      if (i < 0) "" else e.name.substring(0, i)
    }
    byPartition.foreach { case (prefix, es) =>
      val out = fs.create(new Path(
        if (prefix.isEmpty) root else new Path(root, prefix), "manifest"),
        true)
      // base-aware: a shallow clone's manifest lists the SOURCE's
      // absolute URIs for inherited files — still a correct external
      // read (manifests speak absolute paths by design)
      val body = es
        .map(e => TxLog.qualifyAbs(spark, TxLog.dataPathOf(dir, e)))
        .sorted.mkString("\n")
      try out.write(body.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    entries.size.toLong
  }

  /** Read a manifest tree back as the file list it names — what an
    * external engine does; also the round-trip check.
    */
  def manifestFiles(spark: SparkSession, dir: String): Seq[String] = {
    val fs = Compact.fsOf(spark, dir)
    val root = new Path(dir, ManifestDir)
    if (!fs.exists(root)) return Nil
    val it = fs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName == "manifest") {
        val in = fs.open(f.getPath)
        try out ++= scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty)
        finally in.close()
      }
    }
    out.toSeq.sorted
  }
}
