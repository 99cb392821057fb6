package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class UpsertWhereSpec extends SparkSpec {

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  private def same(dir: String, expected: DataFrame): Boolean = {
    val got = spark.read.parquet(dir).select(expected.columns.map(col): _*)
    got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty
  }

  private def layout(dir: String): DataFrame = {
    orders.repartitionByRange(16, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey").write.parquet(dir)
    BloomFileIndex.build(spark, dir, "o_orderkey").localCheckpoint(true)
  }

  private def updatesOf(df: DataFrame): DataFrame = {
    val bump = df.filter(col("o_orderkey").isin(10L, 11L, 12L))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val fresh = df.filter(col("o_orderkey") < 2).select(
      (col("o_orderkey") + 1000000L).as("o_orderkey"), col("o_custkey"),
      lit("N").as("o_orderstatus"), lit(0.0).as("o_totalprice"),
      lit("2000-01-01").cast("timestamp").as("o_orderdate"),
      lit("9-NEW").as("o_orderpriority"))
    bump.unionByName(fresh)
  }

  private def expectedOf(df: DataFrame): DataFrame =
    df.filter(!col("o_orderkey").isin(10L, 11L, 12L))
      .unionByName(updatesOf(df))

  test("pruned merge: adjacent keys touch few files, inserts append, rest untouched") {
    val dir = Files.createTempDirectory("uw_pruned").toString + "/t"
    val ix = layout(dir)
    val up = updatesOf(orders)
    val r = UpsertWhere.byKeys(spark, dir, "o_orderkey", up, Some(ix))
    assert(r.filesTotal == 16)
    // 3 adjacent keys in a key-sorted layout (+ the insert keys' bloom
    // false positives, if any) — far from a full rewrite
    assert(r.candidates < 8, s"candidates ${r.candidates}")
    assert(r.updatedRows == 3)
    assert(r.insertedRows == 2)
    assert(same(dir, expectedOf(orders)))
  }

  test("merge replay is idempotent: same batch twice, same relation") {
    val dir = Files.createTempDirectory("uw_replay").toString + "/t"
    val ix = layout(dir)
    val up = updatesOf(orders)
    UpsertWhere.byKeys(spark, dir, "o_orderkey", up, Some(ix))
    // no index the second time: whole-table merge must land identically
    val r2 = UpsertWhere.byKeys(spark, dir, "o_orderkey", up, None)
    assert(r2.updatedRows == 5) // all 5 batch keys now exist
    assert(r2.insertedRows == 0)
    assert(same(dir, expectedOf(orders)))
  }

  test("all-insert batch with an index appends without touching true negatives") {
    val dir = Files.createTempDirectory("uw_insert").toString + "/t"
    val ix = layout(dir)
    val fresh = orders.filter(col("o_orderkey") < 3).select(
      (col("o_orderkey") + 5000000L).as("o_orderkey"), col("o_custkey"),
      lit("X").as("o_orderstatus"), lit(1.5).as("o_totalprice"),
      lit("2001-01-01").cast("timestamp").as("o_orderdate"),
      lit("0-INS").as("o_orderpriority"))
    val r = UpsertWhere.byKeys(spark, dir, "o_orderkey", fresh, Some(ix))
    assert(r.updatedRows == 0)
    assert(r.insertedRows == 3)
    assert(same(dir, orders.unionByName(fresh)))
  }

  test("empty update batch is a no-op") {
    val dir = Files.createTempDirectory("uw_empty").toString + "/t"
    val ix = layout(dir)
    val r = UpsertWhere.byKeys(spark, dir, "o_orderkey",
      orders.limit(0), Some(ix))
    assert(r.candidates == 0 && r.updatedRows == 0 && r.insertedRows == 0)
    assert(same(dir, orders))
  }

  test("distributed merge matches the request-batch path: same files touched, same relation, no key collect") {
    val dirA = Files.createTempDirectory("uw_dist_a").toString + "/t"
    val dirB = Files.createTempDirectory("uw_dist_b").toString + "/t"
    val ixA = layout(dirA)
    layout(dirB)
    val mfB = ZoneMap.build(spark, dirB, Seq("o_orderkey")).localCheckpoint(true)
    val up = updatesOf(orders)
    val rA = UpsertWhere.byKeys(spark, dirA, "o_orderkey", up, Some(ixA))
    val rB = UpsertWhere.byKeysDistributed(spark, dirB, "o_orderkey", up, Some(mfB))
    // the distributed path's exact probe can only touch FEWER files
    // than the bloom path (no false positives), never more
    assert(rB.candidates <= rA.candidates && rB.candidates > 0)
    assert(rB.untouched >= 13, s"untouched ${rB.untouched}")
    assert(rB.updatedRows == rA.updatedRows && rB.insertedRows == rA.insertedRows)
    assert(same(dirB, expectedOf(orders)))
    val gotA = spark.read.parquet(dirA)
    val gotB = spark.read.parquet(dirB).select(gotA.columns.map(col): _*)
    assert(gotA.exceptAll(gotB).isEmpty && gotB.exceptAll(gotA).isEmpty)
  }

  test("distributed merge carries a 100k-key batch (collect would be the driver bound)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("uw_bulk").toString + "/t"
    val n = 400000L
    spark.range(n).select(col("id").as("k"), (col("id") % 1000).as("v"))
      .repartitionByRange(32, col("k")).sortWithinPartitions("k")
      .write.parquet(dir)
    val mf = ZoneMap.build(spark, dir, Seq("k")).localCheckpoint(true)
    // 150k updates confined to a quarter of the key space + 10k inserts
    val upd = spark.range(150000).select(
      (col("id") * 2).as("k"), lit(-1L).as("v"))
    val ins = spark.range(10000).select(
      (col("id") + n).as("k"), lit(-2L).as("v"))
    val batch = upd.unionByName(ins)
    val r = UpsertWhere.byKeysDistributed(spark, dir, "k", batch, Some(mf))
    assert(r.updatedRows == 150000L && r.insertedRows == 10000L)
    // the key range [0, 300k) bounds the probe; files above it untouched
    assert(r.untouched >= 6, s"untouched ${r.untouched} of ${r.filesTotal}")
    val got = spark.read.parquet(dir)
    assert(got.count() == n + 10000)
    assert(got.filter(col("v") === -1L).count() == 150000L)
    assert(got.filter(col("v") === -2L).count() == 10000L)
    // untouched rows kept their values
    assert(got.filter(col("k") === 1L).head().getLong(1) == 1L)
  }

  test("hive-partitioned log table: keyed delete and merge keep the layout, one commit per operation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("uw_hive").toString + "/t"
    val df = spark.range(4000).select(
      col("id").as("k"),
      (col("id") % 100).as("v"),
      (col("id") % 4).cast("int").as("p"))
    df.repartition(2).write.partitionBy("p").parquet(dir)
    TxLog.convert(spark, dir)
    val v0Names = TxLog.liveFiles(spark, dir)

    // delete keys spanning two partitions (k%4 = partition here)
    val rDel = DeleteWhere.byKeysDistributed(spark, dir, "k",
      Seq(8L, 9L, 13L).toDF("k"), None)
    assert(rDel.deletedRows == 3)
    val v1 = TxLog.currentVersion(spark, dir)
    assert(v1 == 1, "multi-partition delete must be ONE commit")
    val afterDel = TxLog.liveFiles(spark, dir)
    assert(afterDel.forall(_.matches("p=\\d/.*")), s"flat leak: $afterDel")
    val snap1 = TxLog.snapshot(spark, dir)
    assert(snap1.columns.toSet == Set("k", "v", "p"))
    assert(snap1.count() == 3997)
    assert(snap1.filter(col("k").isin(8L, 9L, 13L)).isEmpty)
    // partition column still queries correctly after the rewrite
    assert(snap1.filter(col("p") === 1).count() == 998) // lost k=9,13

    // merge: update two keys + insert one key landing in a NEW row of
    // an existing partition and one in partition 2
    val up = Seq((20L, -5L, 0), (21L, -6L, 1), (9000L, -7L, 2))
      .toDF("k", "v", "p")
    val rUp = UpsertWhere.byKeys(spark, dir, "k", up, None)
    assert(rUp.updatedRows == 2 && rUp.insertedRows == 1)
    assert(TxLog.currentVersion(spark, dir) == 2)
    val snap2 = TxLog.snapshot(spark, dir)
    assert(snap2.count() == 3998)
    assert(snap2.filter(col("k") === 20L).head().getLong(1) == -5L)
    assert(snap2.filter(col("k") === 9000L).head().getInt(2) == 2)
    // time travel across the partitioned rewrites still reconstructs
    val s0 = TxLog.snapshot(spark, dir, 0).select("k", "v", "p")
    assert(s0.exceptAll(df).isEmpty && df.exceptAll(s0).isEmpty)
    assert(v0Names.toSet == TxLog.liveFiles(spark, dir, 0).toSet)
  }

  test("applyChanges: multi-version feed nets per key by commit_version; preimages ignored; idempotent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("uw_cdc").toString + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v").coalesce(1).write.parquet(dir)
    TxLog.convert(spark, dir)
    // k=1: updated twice, LAST postimage (v3) must win
    // k=2: updated then deleted — net delete
    // k=3: deleted then re-inserted — net insert
    // k=5: brand-new insert
    val feed = Seq(
      (1L, "a", "update_preimage", 2L), (1L, "a2", "update_postimage", 2L),
      (1L, "a2", "update_preimage", 3L), (1L, "a3", "update_postimage", 3L),
      (2L, "b2", "update_postimage", 2L), (2L, "b2", "delete", 3L),
      (3L, "c", "delete", 2L), (3L, "c2", "insert", 3L),
      (5L, "e", "insert", 2L))
      .toDF("k", "v", "change_type", "commit_version")
    val r = UpsertWhere.applyChanges(spark, dir, "k", feed)
    val want = Set((1L, "a3"), (3L, "c2"), (4L, "d"), (5L, "e"))
    def state() = TxLog.snapshot(spark, dir).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state() == want, s"got ${state()}")
    // replaced = existing rows overwritten by a net upsert (k=1, k=3);
    // k=2's net delete shows in the state, not the upsert counters
    assert(r.updatedRows == 2 && r.insertedRows == 1)
    // replayed application (crash before the replicator's cursor
    // re-pin): keyed net application is idempotent
    UpsertWhere.applyChanges(spark, dir, "k", feed)
    assert(state() == want)
  }

  test("upsert into a freshly converted EMPTY log-managed table inserts the batch") {
    val dir = Files.createTempDirectory("uw_fresh").toString + "/t"
    TxLog.convert(spark, dir) // v0: zero files, schema not yet known
    val batch = orders.filter(col("o_orderkey") < 10)
    val r = UpsertWhere.byKeys(spark, dir, "o_orderkey", batch, None)
    assert(r.filesTotal == 0 && r.updatedRows == 0)
    assert(r.insertedRows == batch.count())
    val got = TxLog.snapshot(spark, dir).select(batch.columns.map(col): _*)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // and a delete against an empty converted table is a clean no-op
    val dir2 = Files.createTempDirectory("uw_fresh2").toString + "/t"
    TxLog.convert(spark, dir2)
    val rd = DeleteWhere.byKeys(spark, dir2, "o_orderkey", Seq(1L), None)
    assert(rd.filesTotal == 0 && rd.deletedRows == 0)
  }
}
