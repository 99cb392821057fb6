package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level change feed with update images ([[TxLog.changes]]):
  * per-commit attribution, update pre/post pairing by key, replay to
  * the final state, compaction invisibility, DbLog per-table feeds.
  */
class CdfSpec extends SparkSpec {

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("cdf").toString + "/t"
    orders.repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey").write.parquet(dir)
    TxLog.convert(spark, dir)
    dir
  }

  test("TIMESTAMP-bounded CDF: bounds resolve on in-commit stamps, mixed with versions/tags") {
    graft.GraftExtensions.installInto(spark)
    val dir = freshTable() // v0
    Thread.sleep(15)
    val mid = System.currentTimeMillis()
    Thread.sleep(15)
    val bump = orders.filter(pmod(col("o_orderkey"), lit(191)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    UpsertWhere.byKeys(spark, dir, "o_orderkey", bump) // v1
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone(
      spark.conf.get("spark.sql.session.timeZone")))
    val a = fmt.format(new java.util.Date(mid))
    val b = fmt.format(new java.util.Date(System.currentTimeMillis()))
    // (mid, now] covers exactly v1 — same rows as the version form
    val byTs = spark.sql(s"SELECT * FROM graft_changes('$dir', " +
      s"TIMESTAMP '$a', TIMESTAMP '$b', 'o_orderkey')")
    val byV = TxLog.changes(spark, dir, 0, 1, Seq("o_orderkey"))
    assert(same(byTs, byV) && byTs.count() > 0)
    // a window before the table's first commit replays v0 as inserts
    val pre = fmt.format(new java.util.Date(
      TxLog.commitTimeMillis(spark, dir, 0) - 10))
    val fromBirth = spark.sql(s"SELECT * FROM graft_changes('$dir', " +
      s"TIMESTAMP '$pre', TIMESTAMP '$a', 'o_orderkey')")
    assert(fromBirth.filter(col("_change_type") =!= "insert").count() == 0)
    assert(same(fromBirth.drop("_change_type", "_commit_version"), orders))
    // mixed bounds: version low, timestamp high
    assert(same(spark.sql(s"SELECT * FROM graft_changes('$dir', 0, " +
      s"TIMESTAMP '$b', 'o_orderkey')"), byV))
  }

  test("a timestamp window behind the retention horizon errors instead of replaying the horizon as inserts") {
    val dir = freshTable() // v0
    (1 to 3).foreach(i =>
      DeleteWhere.range(spark, dir, "o_orderkey", i.toLong, i.toLong))
    val before = TxLog.commitTimeMillis(spark, dir, 1) - 1
    TxLog.checkpoint(spark, dir)
    TxLog.vacuum(spark, dir, retainVersions = 1) // prunes v0..v2 away
    // `before` is older than every retained commit AND the table is
    // older than it — the floor must refuse, not hand back the whole
    // horizon snapshot as fresh inserts
    val e = intercept[IllegalArgumentException] {
      TxLog.versionFloorAt(spark, dir, before)
    }
    assert(e.getMessage.contains("retention horizon"))
    // a genuinely pre-birth timestamp on an UNPRUNED log still maps
    // to -1 (replay the initial snapshot as inserts)
    val dir2 = freshTable()
    assert(TxLog.versionFloorAt(spark, dir2,
      TxLog.commitTimeMillis(spark, dir2, 0) - 10) == -1)
  }

  test("update images pair by key; one-sided rows stay insert/delete") {
    val dir = freshTable()
    val bump = orders.filter(pmod(col("o_orderkey"), lit(191)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val fresh = orders.filter(col("o_orderkey") < 20)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000L)
    UpsertWhere.byKeys(spark, dir, "o_orderkey",
      bump.unionByName(fresh)) // v1
    DeleteWhere.range(spark, dir, "o_orderkey", 1, 100) // v2
    val ch = TxLog.changes(spark, dir, 0, 2, Seq("o_orderkey"))
      .localCheckpoint()
    // v1: matched keys appear as pre+post image pairs
    val v1 = ch.filter(col("_commit_version") === 1)
    assert(same(v1.filter(col("_change_type") === "update_preimage")
      .drop("_change_type", "_commit_version"),
      orders.filter(pmod(col("o_orderkey"), lit(191)) === 0)))
    assert(same(v1.filter(col("_change_type") === "update_postimage")
      .drop("_change_type", "_commit_version"), bump))
    assert(same(v1.filter(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version"), fresh))
    assert(v1.filter(col("_change_type") === "delete").count() == 0)
    // v2: pure deletes of the post-v1 state's matching keys
    val v2 = ch.filter(col("_commit_version") === 2)
    assert(v2.filter(col("_change_type") =!= "delete").count() == 0)
    assert(same(v2.drop("_change_type", "_commit_version"),
      TxLog.snapshot(spark, dir, 1)
        .filter(col("o_orderkey").between(1, 100))))
  }

  test("a CDF consumer replays the feed to the exact final state") {
    val dir = freshTable()
    UpsertWhere.byKeys(spark, dir, "o_orderkey",
      orders.filter(pmod(col("o_orderkey"), lit(191)) === 0)
        .withColumn("o_orderpriority", lit("CHANGED"))) // v1
    DeletionVectors.delete(spark, dir,
      pmod(col("o_custkey"), lit(11)) === 0) // v2
    // replica seeded at v0, advanced by applying the keyed feed
    val replica = Files.createTempDirectory("cdf_replica").toString + "/r"
    TxLog.snapshot(spark, dir, 0).write.parquet(replica)
    TxLog.convert(spark, replica)
    val feed = TxLog.changes(spark, dir, 0, 2, Seq("o_orderkey"))
      .withColumnRenamed("_change_type", "change_type")
      .withColumnRenamed("_commit_version", "commit_version")
    UpsertWhere.applyChanges(spark, replica, "o_orderkey", feed)
    assert(same(TxLog.snapshot(spark, replica), TxLog.snapshot(spark, dir)))
  }

  test("compaction commits contribute no change rows") {
    val dir = freshTable()
    TxLog.append(spark, dir, orders.limit(3).repartition(2)) // v1
    Compact.binPack(spark, dir,
      targetBytes = 1L << 30, smallBytes = 1L << 30) // v2: pure re-layout
    val ch = TxLog.changes(spark, dir,
      1, TxLog.currentVersion(spark, dir), Seq("o_orderkey"))
    assert(ch.count() == 0)
  }

  test("DbLog per-table feeds: shared versions, untouched tables skip") {
    val db = Files.createTempDirectory("cdf_db").toString + "/db"
    DbLog.create(spark, db) // v0
    DbLog.transact(spark, db, "seed") { txn =>
      txn.append("a", orders.limit(100).repartition(2))
      txn.append("b", orders.limit(50).repartition(2))
    } // v1
    DbLog.transact(spark, db, "only-b") { txn =>
      txn.append("b", orders.limit(5))
    } // v2
    val chA = DbLog.changes(spark, db, "a", 1, 2, Seq("o_orderkey"))
    assert(chA.count() == 0) // v2 never touched a
    val chB = DbLog.changes(spark, db, "b", 0, 2, Seq("o_orderkey"))
    assert(chB.filter(col("_commit_version") === 1).count() == 50)
    assert(chB.filter(col("_commit_version") === 2).count() == 5)
    assert(chB.filter(col("_change_type") =!= "insert").count() == 0)
  }

  test("SQL surface: graft_changes TVF") {
    graft.GraftExtensions.installInto(spark)
    val dir = freshTable()
    DeleteWhere.range(spark, dir, "o_orderkey", 1, 50) // v1
    val n = spark.sql(
      s"SELECT * FROM graft_changes('$dir', 0, 1, 'o_orderkey')")
      .filter(col("_change_type") === "delete").count()
    assert(n == orders.filter(col("o_orderkey").between(1, 50)).count())
  }

  test("streaming graft-cdc with keys emits update images per commit") {
    val dir = freshTable()
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir).option("keys", "o_orderkey")
      .load()
      .writeStream.format("memory").queryName("cdf_keys_sink")
      .option("checkpointLocation",
        Files.createTempDirectory("cdf_ck").toString)
      .start()
    try {
      UpsertWhere.byKeys(spark, dir, "o_orderkey",
        orders.filter(pmod(col("o_orderkey"), lit(191)) === 0)
          .withColumn("o_orderpriority", lit("S1"))) // v1
      DeleteWhere.range(spark, dir, "o_orderkey", 1, 40) // v2
      q.processAllAvailable()
      val got = spark.table("cdf_keys_sink")
      val nUpd = orders.filter(pmod(col("o_orderkey"), lit(191)) === 0).count()
      assert(got.filter(col("_change_type") === "update_preimage" &&
        col("_commit_version") === 1).count() == nUpd)
      assert(got.filter(col("_change_type") === "update_postimage" &&
        col("_commit_version") === 1).count() == nUpd)
      assert(got.filter(col("_change_type") === "delete" &&
        col("_commit_version") === 2).count() ==
        TxLog.snapshot(spark, dir, 1)
          .filter(col("o_orderkey").between(1, 40)).count())
      assert(got.filter(col("_change_type") === "insert").count() == 0)
    } finally q.stop()
  }

  test("graft_changes resolves TAG names: the audit CDF between releases") {
    graft.GraftExtensions.installInto(spark)
    val dir = freshTable()
    TxLog.setTag(spark, dir, "rel1") // v0
    DeleteWhere.range(spark, dir, "o_orderkey", 1, 25) // v1
    TxLog.setTag(spark, dir, "rel2")
    val n = spark.sql(
      s"SELECT * FROM graft_changes('$dir', 'rel1', 'rel2', 'o_orderkey')")
      .filter(col("_change_type") === "delete").count()
    assert(n == orders.filter(col("o_orderkey").between(1, 25)).count())
  }

  test("changes on a shallow clone read through based entries") {
    val src = freshTable()
    val dst = Files.createTempDirectory("cdf_clone").toString + "/c"
    TxLog.cloneTo(spark, src, dst) // v0, all based
    UpsertWhere.byKeys(spark, dst, "o_orderkey",
      orders.filter(pmod(col("o_orderkey"), lit(191)) === 0)
        .withColumn("o_orderpriority", lit("CLONE-EDIT"))) // v1 localizes
    val ch = TxLog.changes(spark, dst, 0, 1, Seq("o_orderkey"))
    assert(same(ch.filter(col("_change_type") === "update_postimage")
      .drop("_change_type", "_commit_version"),
      orders.filter(pmod(col("o_orderkey"), lit(191)) === 0)
        .withColumn("o_orderpriority", lit("CLONE-EDIT"))))
    assert(ch.filter(col("_change_type") === "insert").count() == 0)
  }
}
