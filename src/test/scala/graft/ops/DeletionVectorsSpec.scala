package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DeletionVectorsSpec extends SparkSpec {

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("dv").toString + "/t"
    orders.repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey").write.parquet(dir)
    TxLog.convert(spark, dir)
    dir
  }

  private def dvSidecars(dir: String): Seq[String] = {
    val fs = Compact.fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, "_dv")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  test("DV delete hides matching rows without rewriting data files; time travel sees them") {
    val dir = freshTable()
    val before = Compact.dataFilesRecursive(Compact.fsOf(spark, dir), dir).toSet
    val r = DeletionVectors.delete(spark, dir, col("o_orderkey") <= 50)
    assert(r.deletedRows == orders.filter(col("o_orderkey") <= 50).count())
    assert(r.touched >= 1 && r.touched < 8) // key-sorted: deletes cluster
    // merge-on-read: not one data file rewritten
    val after = Compact.dataFilesRecursive(Compact.fsOf(spark, dir), dir).toSet
    assert(after == before)
    assert(same(TxLog.snapshot(spark, dir),
      orders.filter(col("o_orderkey") > 50)))
    // the pre-delete version still reconstructs exactly
    assert(same(TxLog.snapshot(spark, dir, 0), orders))
  }

  test("a second delete on the same files merges vectors; replay deletes zero") {
    val dir = freshTable()
    DeletionVectors.delete(spark, dir, col("o_orderkey") <= 20)
    val r2 = DeletionVectors.delete(spark, dir,
      col("o_orderkey") > 10 && col("o_orderkey") <= 40)
    assert(r2.deletedRows ==
      orders.filter(col("o_orderkey") > 20 && col("o_orderkey") <= 40).count())
    assert(same(TxLog.snapshot(spark, dir),
      orders.filter(col("o_orderkey") > 40)))
    // replay: the snapshot no longer contains matches — nothing commits
    val v = TxLog.currentVersion(spark, dir)
    val r3 = DeletionVectors.delete(spark, dir, col("o_orderkey") <= 40)
    assert(r3.deletedRows == 0 && r3.dvFile.isEmpty)
    assert(TxLog.currentVersion(spark, dir) == v)
    // per-file stats add up to the full hidden set
    val total = DeletionVectors.stats(spark, dir)
      .agg(sum("deleted_rows")).head().getLong(0)
    assert(total == orders.filter(col("o_orderkey") <= 40).count())
  }

  test("range delete prunes scan candidates from log-carried stats") {
    val dir = freshTable()
    TxLog.setStatsColumns(spark, dir, Seq("o_orderkey"))
    // refresh v0's stat-less entries through a full pack into several
    // key-clustered files (tiny target: sf0.001 orders is ~100 KB)
    Compact.binPack(spark, dir, targetBytes = 8L << 10,
      smallBytes = 64L << 20, sortCols = Seq("o_orderkey"))
    val n = TxLog.liveFiles(spark, dir).size
    assert(n >= 4) // the pruning claim below needs a spread
    val r = DeletionVectors.range(spark, dir, "o_orderkey", 1.0, 30.0)
    assert(r.deletedRows ==
      orders.filter(col("o_orderkey").between(1, 30)).count())
    assert(r.touched < n) // stats ruled most files out
    assert(same(TxLog.snapshot(spark, dir),
      orders.filter(!col("o_orderkey").between(1, 30))))
    // snapshotPruned applies the vector too
    val pruned = TxLog.snapshotPruned(spark, dir, "o_orderkey", 1.0, 100.0)
    assert(same(pruned,
      orders.filter(col("o_orderkey").between(31, 100))))
  }

  test("diff across a DV commit emits exactly the newly-hidden rows as deletes") {
    val dir = freshTable()
    DeletionVectors.delete(spark, dir, col("o_orderkey") <= 15) // v1
    val d = TxLog.diff(spark, dir, 0, 1)
    assert(d.filter(col("_change_type") === "insert").isEmpty)
    assert(same(d.filter(col("_change_type") === "delete").drop("_change_type"),
      orders.filter(col("o_orderkey") <= 15)))
    // second delete: only the increment surfaces
    DeletionVectors.delete(spark, dir, col("o_orderkey") <= 25) // v2
    val d2 = TxLog.diff(spark, dir, 1, 2)
    assert(same(d2.filter(col("_change_type") === "delete").drop("_change_type"),
      orders.filter(col("o_orderkey") > 15 && col("o_orderkey") <= 25)))
  }

  test("copy-on-write deletes over DV-carrying files apply the vector, never resurrect") {
    val dir = freshTable()
    DeletionVectors.delete(spark, dir, col("o_orderkey") <= 50)
    // compaction SKIPS vectored files instead of failing maintenance:
    // the un-vectored small tail still packs, the vectored files and
    // their hidden rows are untouched
    val dvdN = TxLog.liveEntries(spark, dir).count(_.dv.isDefined)
    val rc = Compact.binPack(spark, dir, targetBytes = 64L << 20,
      smallBytes = 64L << 20)
    assert(rc.untouched >= dvdN)
    assert(TxLog.liveEntries(spark, dir).count(_.dv.isDefined) == dvdN)
    assert(same(TxLog.snapshot(spark, dir),
      orders.filter(col("o_orderkey") > 50)))
    // the copy-on-write delete composes (round 12): candidates carrying
    // a vector read through the DV-applying reader, the replacement
    // entries retire the vector, hidden rows stay hidden
    val r = DeleteWhere.range(spark, dir, "o_orderkey", 60.0, 70.0, None)
    assert(r.deletedRows ==
      orders.filter(col("o_orderkey").between(60, 70)).count())
    assert(same(TxLog.snapshot(spark, dir), orders.filter(
      col("o_orderkey") > 50 && !col("o_orderkey").between(60, 70))))
    // the rewritten files no longer need their vector entries
    assert(same(TxLog.snapshot(spark, dir),
      TxLog.read(spark, dir)))
  }

  test("materialize folds vectors in; vacuum sweeps the dead sidecars") {
    val dir = freshTable()
    DeletionVectors.delete(spark, dir, col("o_orderkey") <= 50)
    DeletionVectors.delete(spark, dir, col("o_orderkey") > 9000)
    assert(dvSidecars(dir).nonEmpty)
    val expected = orders
      .filter(col("o_orderkey") > 50 && col("o_orderkey") <= 9000)
    val m = DeletionVectors.materialize(spark, dir)
    assert(m.rowsDropped ==
      orders.count() - expected.count())
    assert(same(TxLog.snapshot(spark, dir), expected))
    assert(TxLog.liveEntries(spark, dir).forall(_.dv.isEmpty))
    // replay: nothing left to fold
    assert(DeletionVectors.materialize(spark, dir).rewritten == 0)
    // pre-materialize versions still read their vectors…
    assert(same(TxLog.snapshot(spark, dir, 1),
      orders.filter(col("o_orderkey") > 50)))
    // …until retention drops them; then the sidecars are reclaimable
    TxLog.vacuum(spark, dir, retainVersions = 1, dvSweepAgeMs = 0L)
    assert(dvSidecars(dir).isEmpty)
    assert(same(TxLog.snapshot(spark, dir), expected))
  }

  test("concurrent DV writers on the same file conflict instead of losing a vector") {
    val dir = freshTable()
    // both writers read the SAME parent state (the plain entry), then
    // commit in turn: the file NAME stays live through the winner's
    // commit, so name-level validation alone would let the loser land
    // and silently drop the winner's deletes — the entry-level `seen`
    // check must reject it
    val e = TxLog.liveEntries(spark, dir).head
    TxLog.commitEntries(spark, dir,
      adds = Seq(e.copy(dv = Some("dv-w1.parquet"))),
      removes = Seq(e.name), seen = Seq(e))
    val ex = intercept[java.util.ConcurrentModificationException] {
      TxLog.commitEntries(spark, dir,
        adds = Seq(e.copy(dv = Some("dv-w2.parquet"))),
        removes = Seq(e.name), seen = Seq(e))
    }
    assert(ex.getMessage.contains("deletion vector changed"))
    // a writer on a DIFFERENT file is unaffected
    val other = TxLog.liveEntries(spark, dir).find(_.dv.isEmpty).get
    TxLog.commitEntries(spark, dir,
      adds = Seq(other.copy(dv = Some("dv-w3.parquet"))),
      removes = Seq(other.name), seen = Seq(other))
  }

  test("DVs work on a hive-partitioned table, prefixes intact") {
    val dir = Files.createTempDirectory("dvp").toString + "/t"
    orders.withColumn("bucket", pmod(col("o_orderkey"), lit(4)))
      .write.partitionBy("bucket").parquet(dir)
    TxLog.convert(spark, dir)
    val r = DeletionVectors.delete(spark, dir,
      col("bucket") === 1 && col("o_orderkey") <= 100)
    val expected = orders.withColumn("bucket", pmod(col("o_orderkey"), lit(4)))
      .filter(!(col("bucket") === 1 && col("o_orderkey") <= 100))
    assert(r.deletedRows ==
      orders.count() - expected.count())
    assert(same(TxLog.snapshot(spark, dir), expected))
    // partition-prefixed entries carry their vectors
    assert(TxLog.liveEntries(spark, dir)
      .filter(_.dv.isDefined).forall(_.name.startsWith("bucket=1/")))
    val m = DeletionVectors.materialize(spark, dir)
    assert(m.rewritten == r.touched)
    assert(same(TxLog.snapshot(spark, dir), expected))
  }

  test("bloom-pruned keyed purge positions only the files that hold a key") {
    val dir = freshTable()
    val ix = BloomFileIndex.build(spark, dir, "o_orderkey")
    val ks = orders.select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0))
    val keys: Seq[Any] = Seq(ks.head, ks(ks.length / 2), ks.last)
    val r = DeletionVectors.byKeys(spark, dir, "o_orderkey", keys, Some(ix))
    assert(r.deletedRows == 3)
    assert(r.touched <= 3) // key-sorted layout: ≤ one file per key
    assert(same(TxLog.snapshot(spark, dir),
      orders.filter(!col("o_orderkey").isin(keys: _*))))
  }

  test("distributed keyed purge semi-joins a data-sized batch into positions") {
    val dir = freshTable()
    val keysDf = orders.filter(pmod(col("o_orderkey"), lit(97)) === 0)
      .select("o_orderkey")
    val r = DeletionVectors.byKeysDistributed(
      spark, dir, "o_orderkey", keysDf, None)
    assert(r.deletedRows == keysDf.count())
    assert(same(TxLog.snapshot(spark, dir),
      orders.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)))
  }

  test("stats-pruned reads apply vectors (bloom point, zone-map range)") {
    val dir = freshTable()
    val ix = BloomFileIndex.build(spark, dir, "o_orderkey")
    val mf = ZoneMap.build(spark, dir, Seq("o_orderkey"))
    DeletionVectors.delete(spark, dir, col("o_orderkey") <= 50)
    // a hidden key's point read must come back empty, a surviving
    // sibling in the SAME (vectored) file must still read
    val hidden = orders.filter(col("o_orderkey") <= 50)
      .select("o_orderkey").head().getLong(0)
    assert(BloomFileIndex
      .prunedRead(spark, dir, ix, "o_orderkey", Seq(hidden)).isEmpty)
    assert(same(
      ZoneMap.prunedRead(spark, dir, mf, "o_orderkey", 1.0, 100.0),
      orders.filter(col("o_orderkey").between(51, 100))))
  }

  test("materializeWhere folds only files past the deleted-fraction threshold") {
    val dir = freshTable()
    val keyMax = orders.agg(max("o_orderkey")).head().getLong(0)
    // key-sorted 8-file layout: hollow out the low range (most of the
    // first file), poke one hole near the top
    DeletionVectors.delete(spark, dir,
      col("o_orderkey") <= keyMax / 9)
    DeletionVectors.delete(spark, dir, col("o_orderkey") === keyMax)
    val dvdBefore = TxLog.liveEntries(spark, dir).count(_.dv.isDefined)
    assert(dvdBefore >= 2)
    val m = DeletionVectors.materializeWhere(spark, dir, 0.5)
    assert(m.rewritten >= 1 && m.rewritten < dvdBefore)
    // the one-row hole keeps its cheap vector
    assert(TxLog.liveEntries(spark, dir).count(_.dv.isDefined) ==
      dvdBefore - m.rewritten)
    assert(same(TxLog.snapshot(spark, dir), orders.filter(
      col("o_orderkey") > keyMax / 9 && col("o_orderkey") =!= keyMax)))
  }

  test("merge-on-read upsert: matched rows hide, replacements append, one commit") {
    val dir = freshTable()
    val v0 = TxLog.currentVersion(spark, dir)
    val before = Compact.dataFilesRecursive(Compact.fsOf(spark, dir), dir).toSet
    val batch = orders.filter(col("o_orderkey") <= 30)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .unionByName(orders.filter(col("o_orderkey") <= 3).select(
        (col("o_orderkey") + 1000000L).as("o_orderkey"), col("o_custkey"),
        lit("N").as("o_orderstatus"), lit(0.0).as("o_totalprice"),
        col("o_orderdate"), lit("9-NEW").as("o_orderpriority")))
    val r = DeletionVectors.upsert(spark, dir, batch, Seq("o_orderkey"))
    assert(r.replacedRows ==
      orders.filter(col("o_orderkey") <= 30).count())
    assert(r.insertedFiles >= 1)
    assert(TxLog.currentVersion(spark, dir) == v0 + 1) // ONE commit
    // not one pre-existing data file rewritten or removed from disk
    val after = Compact.dataFilesRecursive(Compact.fsOf(spark, dir), dir)
    assert(before.subsetOf(after.toSet))
    val expected = orders.filter(col("o_orderkey") > 30).unionByName(batch)
    assert(same(TxLog.snapshot(spark, dir), expected))
    // the pre-merge version still reconstructs
    assert(same(TxLog.snapshot(spark, dir, v0), orders))
  }

  test("mor upsert with a txn id replays as a no-op") {
    val dir = freshTable()
    val batch = orders.filter(col("o_orderkey") <= 10)
      .withColumn("o_totalprice", lit(1.0))
    val r1 = DeletionVectors.upsert(spark, dir, batch, Seq("o_orderkey"),
      txn = Some("epoch-7"))
    assert(r1.replacedRows > 0)
    val r2 = DeletionVectors.upsert(spark, dir, batch, Seq("o_orderkey"),
      txn = Some("epoch-7"))
    assert(r2.replacedRows == 0 && r2.insertedFiles == 0)
    assert(same(TxLog.snapshot(spark, dir),
      orders.filter(col("o_orderkey") > 10).unionByName(batch)))
  }

  test("schema evolution through the MOR upsert: pinned, versioned, null-filled") {
    val dir = freshTable()
    val v0 = TxLog.currentVersion(spark, dir)
    // unannounced drift is rejected, not silently landed
    val widened = orders.filter(col("o_orderkey") <= 10)
      .withColumn("o_channel", lit("web"))
    val e = intercept[IllegalArgumentException] {
      DeletionVectors.upsert(spark, dir, widened, Seq("o_orderkey"))
    }
    assert(e.getMessage.contains("evolveSchema"))
    // opted in: the widened schema is pinned in the log
    DeletionVectors.upsert(spark, dir, widened, Seq("o_orderkey"),
      evolveSchema = true)
    val snap = TxLog.snapshot(spark, dir)
    assert(snap.columns.contains("o_channel"))
    // old files read NULL for the new column; the batch carries it
    assert(snap.filter(col("o_channel").isNull).count() ==
      orders.filter(col("o_orderkey") > 10).count())
    assert(snap.filter(col("o_channel") === "web").count() ==
      orders.filter(col("o_orderkey") <= 10).count())
    // a type conflict on an existing column still refuses
    intercept[IllegalArgumentException] {
      DeletionVectors.upsert(spark, dir,
        widened.withColumn("o_totalprice", lit("not-a-number")),
        Seq("o_orderkey"), evolveSchema = true)
    }
    // versioned pin: the pre-evolution snapshot keeps its own width
    assert(!TxLog.snapshot(spark, dir, v0).columns.contains("o_channel"))
    // a second, batch-narrower upsert aligns (missing new column
    // null-fills) without a new pin
    DeletionVectors.upsert(spark, dir,
      orders.filter(col("o_orderkey") === 20)
        .withColumn("o_totalprice", lit(5.0)),
      Seq("o_orderkey"), evolveSchema = true)
    val row20 = TxLog.snapshot(spark, dir)
      .filter(col("o_orderkey") === 20).head()
    assert(row20.getAs[Double]("o_totalprice") == 5.0 &&
      row20.isNullAt(row20.fieldIndex("o_channel")))
  }

  test("pushed filters + row-group skipping keep vectored positions honest") {
    import spark.implicits._
    // one wide file with MANY small row groups, so a selective filter
    // actually skips groups — if row_index were computed per-surviving
    // -group instead of per-file, the anti-join would hide the WRONG
    // rows and this equality breaks
    val dir = Files.createTempDirectory("dv_rg").toString + "/t"
    val n = 200000L
    spark.range(n).select(col("id").as("k"),
      (col("id") % 7).as("v"))
      .coalesce(1)
      .write.option("parquet.block.size", 64 * 1024).parquet(dir)
    TxLog.convert(spark, dir)
    val fs = Compact.fsOf(spark, dir)
    val f = s"$dir/${TxLog.liveFiles(spark, dir).head}"
    val groups = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f),
        new org.apache.hadoop.conf.Configuration())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.size finally r.close()
    }
    assert(groups >= 8, s"need many row groups to skip, got $groups")
    DeletionVectors.delete(spark, dir, pmod(col("k"), lit(10)) === 3)
    // a selective range that admits few groups, on top of the vector
    val got = TxLog.snapshot(spark, dir)
      .filter(col("k").between(150000, 151000))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val want = (150000L to 151000L).filter(_ % 10 != 3)
      .map(k => (k, k % 7)).sorted
    assert(got == want)
    // and the whole relation survives exactly
    assert(TxLog.snapshot(spark, dir).count() == n - n / 10)
  }

  test("Maintenance.run: fold → pack → checkpoint → vacuum in one idempotent pass") {
    val dir = freshTable()
    // accrue state: a heavy vector on the low file, updates appended
    DeletionVectors.delete(spark, dir,
      col("o_orderkey") <= orders.agg(max("o_orderkey")).head().getLong(0) / 9)
    val up = orders.limit(20).withColumn("o_totalprice", lit(9.9))
    DeletionVectors.upsert(spark, dir, up, Seq("o_orderkey"))
    val expected = TxLog.snapshot(spark, dir).collect()
    val r = Maintenance.run(spark, dir, dvFoldFraction = 0.5,
      targetBytes = 64L << 20, smallBytes = 64L << 20, retainVersions = 1)
    assert(r.foldedFiles >= 1 && r.packedFiles >= 2)
    assert(r.checkpointedAt == TxLog.currentVersion(spark, dir))
    assert(r.filesReclaimed > 0)
    // the relation rode through untouched
    assert(TxLog.snapshot(spark, dir).collect().toSet == expected.toSet)
    // replay: nothing left to do, nothing disturbed
    val r2 = Maintenance.run(spark, dir, retainVersions = 1)
    assert(r2.foldedFiles == 0)
    assert(TxLog.snapshot(spark, dir).collect().toSet == expected.toSet)
    // time-based retention variant parses and keeps the current state
    Maintenance.run(spark, dir, retainMs = 0L)
    assert(TxLog.snapshot(spark, dir).collect().toSet == expected.toSet)
    intercept[IllegalArgumentException] {
      Maintenance.run(spark, dir, retainVersions = 1, retainMs = 1000L)
    }
  }

  test("restore to a DV version revives the vector association") {
    val dir = freshTable()
    DeletionVectors.delete(spark, dir, col("o_orderkey") <= 50) // v1
    DeletionVectors.materialize(spark, dir) // v2
    TxLog.restore(spark, dir, 1) // v3 == v1's state
    assert(TxLog.liveEntries(spark, dir).exists(_.dv.isDefined))
    assert(same(TxLog.snapshot(spark, dir),
      orders.filter(col("o_orderkey") > 50)))
  }
}
