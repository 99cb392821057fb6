package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shallow clone composed with the rest of the lakehouse surface:
  * whole-DATABASE clones (DbLog), hidden partitioning (spec travels,
  * pruning works through based entries), branches on a clone,
  * streaming CDC over a clone, stats-carried pruned reads.
  */
class CloneCompositionSpec extends SparkSpec {

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  test("whole-DATABASE clone: multi-table txns diverge, per-table config travels") {
    val src = tmp("ccomp_db_src")
    DbLog.create(spark, src)
    DbLog.setCheckConstraints(spark, src, "o", Seq("o_totalprice >= 0"))
    DbLog.transact(spark, src, "seed") { txn =>
      txn.append("o", orders.limit(200).repartition(4))
      txn.append("c", orders.limit(40).select("o_custkey").distinct())
    }
    val dst = tmp("ccomp_db_dst")
    TxLog.cloneTo(spark, src, dst)
    // a multi-table atomic txn against the CLONE
    DbLog.transact(spark, dst, "clone-edit") { txn =>
      txn.deleteWhere("o", col("o_orderkey") <= 100)
      txn.append("c", orders.limit(1).select("o_custkey"))
    }
    assert(same(DbLog.snapshot(spark, dst, "o"),
      orders.limit(200).filter(col("o_orderkey") > 100)))
    assert(DbLog.snapshot(spark, dst, "c").count() ==
      orders.limit(40).select("o_custkey").distinct().count() + 1)
    // source tables unmoved
    assert(same(DbLog.snapshot(spark, src, "o"), orders.limit(200)))
    // the cloned database still enforces ITS per-table constraint
    intercept[TxLog.ConstraintViolation] {
      DbLog.transact(spark, dst, "bad") { txn =>
        txn.append("o", orders.limit(1).withColumn("o_totalprice", lit(-1.0)))
      }
    }
  }

  test("hidden partitioning: spec travels, clone scans prune through based entries") {
    val src = tmp("ccomp_hp_src")
    val df = orders.select(col("o_orderkey").as("k"), col("o_custkey"),
      col("o_totalprice"))
    PartitionTransforms.write(spark, df, src,
      Seq(PartitionTransforms.parseTransform("bucket:8:k")))
    val dst = tmp("ccomp_hp_dst")
    TxLog.cloneTo(spark, src, dst)
    assert(PartitionTransforms.spec(spark, dst).map(_.serialized) ==
      PartitionTransforms.spec(spark, src).map(_.serialized))
    val keys = Seq(5L, 7L)
    val pruned = PartitionTransforms.scanEquals(spark, dst, "k", keys)
    assert(same(pruned, df.filter(col("k").isin(keys: _*))))
    // the equality probe must open FEWER files than the snapshot
    assert(TxLog.dataInputFilesOf(pruned).size <
      TxLog.liveEntries(spark, dst).size / 2)
    // appends through the spec land in the CLONE's partition tree
    PartitionTransforms.append(spark,
      df.limit(3).withColumn("k", col("k") + 900000L), dst)
    assert(TxLog.snapshot(spark, dst).count() == df.count() + 3)
    assert(TxLog.snapshot(spark, src).count() == df.count())
  }

  test("branches fork a CLONE: audit on the branch, publish, source untouched") {
    val src = tmp("ccomp_br_src")
    orders.limit(500).repartition(4).write.parquet(src)
    TxLog.convert(spark, src)
    val dst = tmp("ccomp_br_dst")
    TxLog.cloneTo(spark, src, dst)
    TxLog.createBranch(spark, dst, "wap")
    TxLog.withBranch(spark, dst, "wap") {
      DeleteWhere.range(spark, dst, "o_orderkey", 1, 50)
    }
    // main clone unmoved while the branch is open
    assert(TxLog.snapshot(spark, dst).count() == 500)
    TxLog.publishBranch(spark, dst, "wap")
    assert(same(TxLog.snapshot(spark, dst),
      orders.limit(500).filter(!col("o_orderkey").between(1, 50))))
    assert(same(TxLog.snapshot(spark, src), orders.limit(500)))
  }

  test("graft-cdc streams a clone: based v0 replays as inserts, clone commits flow") {
    val src = tmp("ccomp_cdc_src")
    orders.limit(300).repartition(4).write.parquet(src)
    TxLog.convert(spark, src)
    val dst = tmp("ccomp_cdc_dst")
    TxLog.cloneTo(spark, src, dst)
    val q = spark.readStream.format("graft-cdc")
      .option("path", dst).option("startingVersion", "0")
      .load()
      .writeStream.format("memory").queryName("ccomp_cdc_sink")
      .option("checkpointLocation",
        Files.createTempDirectory("ccomp_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("ccomp_cdc_sink")
        .filter(col("_change_type") === "insert").count() == 300)
      DeleteWhere.range(spark, dst, "o_orderkey", 1, 25)
      q.processAllAvailable()
      assert(spark.table("ccomp_cdc_sink")
        .filter(col("_change_type") === "delete").count() ==
        orders.limit(300).filter(col("o_orderkey").between(1, 25)).count())
    } finally q.stop()
  }

  test("log-carried stats travel: snapshotPruned prunes on the clone") {
    val src = tmp("ccomp_st_src")
    orders.repartition(4).write.parquet(src)
    TxLog.convert(spark, src)
    TxLog.setStatsColumns(spark, src, Seq("o_orderkey"))
    // refresh v0's stat-less entries into stats-carrying ones
    Compact.binPack(spark, src, targetBytes = 8L << 10, smallBytes = 1L << 30,
      sortCols = Seq("o_orderkey"))
    assert(TxLog.liveEntries(spark, src).size > 1)
    val dst = tmp("ccomp_st_dst")
    TxLog.cloneTo(spark, src, dst)
    assert(TxLog.liveEntries(spark, dst)
      .forall(_.stats.exists(_.column == "o_orderkey")))
    val pruned = TxLog.snapshotPruned(spark, dst, "o_orderkey", 1, 60)
    assert(same(pruned, orders.filter(col("o_orderkey").between(1, 60))))
    assert(TxLog.dataInputFilesOf(pruned).size <
      TxLog.liveEntries(spark, dst).size)
  }
}
