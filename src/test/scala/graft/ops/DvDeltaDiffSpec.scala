package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DV-delta-aware change feeds: an entry whose only change between
  * two versions is its deletion vector is served POSITIONALLY — the
  * removed side comes from the sidecar's position delta, never from
  * re-reading both sides of the file whole. These tests hold the
  * positional path to exact output equality with the whole-read
  * semantics (both snapshots exceptAll'd), on the three shapes that
  * exercise it: a scattered grown-vector churn, a keyless `_row_id`
  * feed over the same, and a RESTORE that shrinks vectors (revived
  * positions surface as inserts).
  */
class DvDeltaDiffSpec extends SparkSpec {

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("dvdelta").toString + "/t"
    orders.repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey").write.parquet(dir)
    TxLog.convert(spark, dir)
    dir
  }

  private def naiveDiff(dir: String, from: Int, to: Int): DataFrame = {
    val before = TxLog.snapshot(spark, dir, from)
    val after = TxLog.snapshot(spark, dir, to)
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(
        before.exceptAll(after).withColumn("_change_type", lit("delete")))
  }

  test("scattered grown-DV churn: positional diff equals the whole-read semantics") {
    val dir = freshTable() // v0
    // one matching row in EVERY file — the shape where "changed
    // files" degenerates to all files
    val r1 = DeletionVectors.delete(spark, dir,
      pmod(col("o_orderkey"), lit(97)) === 0) // v1: every file gains a DV
    assert(r1.touched == 8 && r1.deletedRows > 0)
    val d = TxLog.diff(spark, dir, 0, 1)
    assert(d.filter(col("_change_type") === "insert").isEmpty)
    assert(d.filter(col("_change_type") === "delete").count() == r1.deletedRows)
    assert(same(d, naiveDiff(dir, 0, 1)))
    // the receipt: with every hidden position covered by the deleting
    // commit's change-data sidecar, the feed PLAN reads zero table
    // bytes (sidecar + position work ran churn-sized at build time)
    assert(TxLog.diff(spark, dir, 0, 1).inputFiles.isEmpty)
    // a SECOND scattered purge grows the already-vectored entries:
    // the delta must be only the newly hidden positions
    val r2 = DeletionVectors.delete(spark, dir,
      pmod(col("o_orderkey"), lit(89)) === 1) // v2
    val d2 = TxLog.diff(spark, dir, 1, 2)
    assert(d2.count() == r2.deletedRows)
    assert(same(d2, naiveDiff(dir, 1, 2)))
    // the full range still telescopes
    assert(same(TxLog.diff(spark, dir, 0, 2), naiveDiff(dir, 0, 2)))
  }

  test("keyless _row_id feed over a grown-DV commit pairs the positional rows") {
    val dir = freshTable() // v0
    RowTracking.enable(spark, dir) // v1 (metadata backfill)
    val idsBefore = RowTracking.read(spark, dir)
      .filter(pmod(col("o_orderkey"), lit(101)) === 0)
      .select("o_orderkey", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idsBefore.nonEmpty)
    DeletionVectors.delete(spark, dir,
      pmod(col("o_orderkey"), lit(101)) === 0) // v2: scattered DV churn
    val feed = TxLog.changes(spark, dir, 1, 2, Nil)
    // pure deletes (no same-id insert to pair with), ids intact
    assert(feed.filter(col("_change_type") =!= "delete").isEmpty)
    val got = feed.select("o_orderkey", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == idsBefore)
  }

  test("RESTORE shrinking vectors revives positions as inserts") {
    val dir = freshTable() // v0
    DeletionVectors.delete(spark, dir,
      pmod(col("o_orderkey"), lit(103)) === 2) // v1
    TxLog.restore(spark, dir, 0) // v2: same names, vectors dropped
    val d = TxLog.diff(spark, dir, 1, 2)
    assert(d.filter(col("_change_type") === "delete").isEmpty)
    assert(same(d, naiveDiff(dir, 1, 2)))
    assert(d.count() > 0)
    // and the round trip nets to nothing
    assert(TxLog.diff(spark, dir, 0, 2).isEmpty)
  }

  test("vacuum sweeps change-data sidecars with their commits") {
    val dir = freshTable() // v0
    DeletionVectors.delete(spark, dir,
      pmod(col("o_orderkey"), lit(107)) === 3) // v1 + cdc sidecar
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cdcDir = new org.apache.hadoop.fs.Path(dir, "_cdc")
    assert(fs.listStatus(cdcDir).count(_.isFile) == 1)
    DeletionVectors.materialize(spark, dir) // v2: vectors folded
    TxLog.checkpoint(spark, dir)
    // v1 falls behind the horizon → its sidecar is unreferenced
    TxLog.vacuum(spark, dir, retainVersions = 1, dvSweepAgeMs = 0)
    assert(!fs.exists(cdcDir) || fs.listStatus(cdcDir).count(_.isFile) == 0)
    // a retained CDC commit keeps its sidecar through vacuum
    val dir2 = freshTable()
    DeletionVectors.delete(spark, dir2,
      pmod(col("o_orderkey"), lit(107)) === 3)
    TxLog.vacuum(spark, dir2, retainVersions = 5, dvSweepAgeMs = 0)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir2, "_cdc"))
      .count(_.isFile) == 1)
    assert(same(TxLog.diff(spark, dir2, 0, 1), naiveDiff(dir2, 0, 1)))
  }
}
