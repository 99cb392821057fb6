package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.TxLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TxLogIngestSpec extends SparkSpec {

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  test("epochs append atomically; a replayed epoch is a no-op") {
    val dir = Files.createTempDirectory("txi").toString + "/t"
    val sink = TxLogIngest.appendSink(dir)
    val even = orders.filter(col("o_orderkey") % 2 === 0)
    val odd = orders.filter(col("o_orderkey") % 2 === 1)
    sink(even, 0)
    sink(odd, 1)
    sink(odd, 1) // re-delivered epoch: txn probe must skip it
    assert(TxLog.currentVersion(spark, dir) == 2) // v0 + two appends
    assert(same(TxLog.snapshot(spark, dir), orders))
    // epoch atomicity in the log: each append is ONE version
    assert(same(TxLog.snapshot(spark, dir, 1), even))
  }

  test("a replayed epoch is still skipped after vacuum pruned the log") {
    val dir = Files.createTempDirectory("txi_v").toString + "/t"
    val sink = TxLogIngest.appendSink(dir)
    val even = orders.filter(col("o_orderkey") % 2 === 0)
    val odd = orders.filter(col("o_orderkey") % 2 === 1)
    sink(even, 0)
    sink(odd, 1)
    TxLog.vacuum(spark, dir, retainVersions = 1) // prunes v0/v1 into a checkpoint
    sink(odd, 1) // replay: the checkpoint's cumulative txn set must remember it
    assert(same(TxLog.snapshot(spark, dir), orders))
  }

  test("mergeSink applies CDC epochs exactly-once through the vectored MERGE") {
    val dir = Files.createTempDirectory("txi_m").toString + "/t"
    val sink = TxLogIngest.mergeSink(dir, Seq("o_orderkey"))
    sink(orders, 0) // first epoch: plain append (nothing to merge)
    val e1 = orders.filter(col("o_orderkey") <= 20)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    sink(e1, 1)
    sink(e1, 1) // re-delivered epoch: txn probe must skip it
    val expected = orders.filter(col("o_orderkey") > 20).unionByName(e1)
    assert(same(TxLog.snapshot(spark, dir), expected))
    // merged, not rewritten: the matched files carry vectors
    assert(TxLog.liveEntries(spark, dir).exists(_.dv.isDefined))
  }

  test("mergeSink nets each epoch by SEQUENCE-BY before applying") {
    val dir = Files.createTempDirectory("txi_s").toString + "/t"
    val sink = TxLogIngest.mergeSink(dir, Seq("o_orderkey"),
      seqCol = Some("seq"))
    sink(orders.withColumn("seq", lit(0L)), 0)
    // one epoch carries two versions of the same keys: only seq=2 lands
    val twice = orders.filter(col("o_orderkey") <= 10)
      .withColumn("o_totalprice", lit(111.0)).withColumn("seq", lit(1L))
      .unionByName(orders.filter(col("o_orderkey") <= 10)
        .withColumn("o_totalprice", lit(222.0)).withColumn("seq", lit(2L)))
    sink(twice, 1)
    val got = TxLog.snapshot(spark, dir)
      .filter(col("o_orderkey") <= 10).select("o_totalprice").distinct()
    assert(got.collect().map(_.getDouble(0)).toSeq == Seq(222.0))
  }

  test("mergeSink's materializeEvery folds heavy vectors in-line") {
    val dir = Files.createTempDirectory("txi_mm").toString + "/t"
    val sink = TxLogIngest.mergeSink(dir, Seq("o_orderkey"),
      materializeEvery = 2)
    sink(orders, 0)
    sink(orders.withColumn("o_totalprice", lit(1.0)), 1) // 100% tombstones
    // epoch 1 triggered the fold: no vectors survive, state exact
    assert(TxLog.liveEntries(spark, dir).forall(_.dv.isEmpty))
    assert(same(TxLog.snapshot(spark, dir),
      orders.withColumn("o_totalprice", lit(1.0))))
  }

  test("mergeSink's compactEvery packs the appended tail around vectored files") {
    val dir = Files.createTempDirectory("txi_mc").toString + "/t"
    val sink = TxLogIngest.mergeSink(dir, Seq("o_orderkey"),
      compactEvery = 4, compactTargetBytes = 64L << 20)
    sink(orders.repartition(4), 0)
    (1 to 3).foreach { e =>
      sink(orders.filter(col("o_orderkey") <= 5 * e)
        .withColumn("o_totalprice", lit(e.toDouble)), e.toLong)
    }
    // epoch 3 triggered the pack: the DV-less appended tail merged,
    // the vectored originals were skipped, and the state is exact
    assert(TxLog.liveEntries(spark, dir).exists(_.dv.isDefined))
    val expected = orders.filter(col("o_orderkey") > 15)
      .unionByName(orders.filter(col("o_orderkey") <= 5)
        .withColumn("o_totalprice", lit(3.0)))
      .unionByName(orders
        .filter(col("o_orderkey") > 5 && col("o_orderkey") <= 10)
        .withColumn("o_totalprice", lit(3.0)))
      .unionByName(orders
        .filter(col("o_orderkey") > 10 && col("o_orderkey") <= 15)
        .withColumn("o_totalprice", lit(3.0)))
    assert(same(TxLog.snapshot(spark, dir), expected))
  }

  test("compactEvery maintains the tail in-line; checkpointed snapshots stay exact") {
    val dir = Files.createTempDirectory("txi_c").toString + "/t"
    val sink = TxLogIngest.appendSink(dir, compactEvery = 4,
      compactTargetBytes = 64L << 20)
    (0 until 8).foreach { e =>
      sink(orders.filter(col("o_orderkey") % 8 === e).repartition(2), e.toLong)
    }
    assert(same(TxLog.snapshot(spark, dir), orders))
    // two maintenance passes ran: the live tail is packed small
    assert(TxLog.liveFiles(spark, dir).size <= 3)
    // time travel across a checkpoint boundary still reconstructs
    val v2 = TxLog.snapshot(spark, dir, 2) // epochs 0+1 only
    assert(same(v2, orders.filter(col("o_orderkey") % 8 < 2)))
  }
}
