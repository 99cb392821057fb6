package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based check of the whole lakehouse stack: a deterministic
  * random sequence of append / delete / upsert / compact / restore
  * runs against a [[TxLog]]-managed table AND an in-memory model;
  * after every operation the committed snapshot must equal the model
  * exactly. Catches cross-operator interactions (a compact between a
  * delete and a restore, an upsert over a just-packed file) that
  * single-operator specs cannot.
  */
class TxLogModelSpec extends SparkSpec {

  test("15 random lakehouse operations: snapshot == model after every step") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dir = Files.createTempDirectory("txmodel").toString + "/t"

    // model: key -> value (upsert semantics by key)
    val model = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    var nextKey = 0L
    // model state per committed version, for restore
    val modelAt = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Long]]

    def df(rows: Seq[(Long, Long)]) = rows.toDF("k", "v")
    def snapState(): Unit = modelAt += model.toMap
    def check(step: String): Unit = {
      val got =
        if (TxLog.liveFiles(spark, dir).isEmpty) Seq.empty[(Long, Long)]
        else TxLog.snapshot(spark, dir).select("k", "v")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
      val want = model.toSeq.sorted
      assert(got == want,
        s"$step: snapshot ${got.length} rows != model ${want.length}")
    }

    // v0: empty table
    TxLog.convert(spark, dir)
    snapState()

    def append(): Unit = {
      val rows = (0 until (5 + rnd.nextInt(20)))
        .map { _ => nextKey += 1; (nextKey, rnd.nextLong(1000)) }
      graft.streaming.TxLogIngest.appendSink(dir)(df(rows),
        TxLog.currentVersion(spark, dir).toLong + 1000)
      rows.foreach { case (k, v) => model(k) = v }
    }

    def deleteRange(): Unit = {
      if (model.isEmpty) return
      val ks = model.keys.toSeq.sorted
      val lo = ks(rnd.nextInt(ks.length))
      val hi = lo + rnd.nextInt(10)
      val before = TxLog.currentVersion(spark, dir)
      DeleteWhere.range(spark, dir, "k", lo.toDouble, hi.toDouble, None)
      model.filterInPlace((k, _) => k < lo || k > hi)
      if (TxLog.currentVersion(spark, dir) == before) return // no candidates: no commit
    }

    def upsert(): Unit = {
      if (model.isEmpty) return
      val ks = model.keys.toSeq.sorted
      val existing = (0 until 3).map(_ => ks(rnd.nextInt(ks.length))).distinct
      val fresh = (0 until 2).map { _ => nextKey += 1; nextKey }
      val rows = (existing ++ fresh).map(k => (k, rnd.nextLong(1000)))
      UpsertWhere.byKeys(spark, dir, "k", df(rows), None)
      rows.foreach { case (k, v) => model(k) = v }
    }

    def compact(): Unit = {
      val before = TxLog.currentVersion(spark, dir)
      Compact.binPack(spark, dir, targetBytes = 64L << 20,
        smallBytes = 64L << 20)
      if (TxLog.currentVersion(spark, dir) == before) return // <2 files: no-op
    }

    def restore(): Unit = {
      val v = rnd.nextInt(modelAt.length)
      TxLog.restore(spark, dir, v)
      model.clear()
      modelAt(v).foreach { case (k, x) => model(k) = x }
    }

    append(); snapState(); check("seed append")
    (0 until 15).foreach { i =>
      val before = TxLog.currentVersion(spark, dir)
      rnd.nextInt(5) match {
        case 0 | 1 => append()
        case 2 => deleteRange()
        case 3 => upsert()
        case 4 => if (rnd.nextBoolean()) compact() else restore()
      }
      // record model state for every version the op committed
      (before until TxLog.currentVersion(spark, dir)).foreach(_ => snapState())
      check(s"op $i")
    }
    // closing sweep: vacuum must not disturb the current state
    TxLog.vacuum(spark, dir, retainVersions = 2)
    check("post-vacuum")
  }

  test("merge-on-read lifecycle: 15 random DV ops, snapshot == model, diff == model delta") {
    import spark.implicits._
    val rnd = new scala.util.Random(1337)
    val dir = Files.createTempDirectory("txmodel_dv").toString + "/t"

    val model = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    var nextKey = 0L
    val modelAt = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Long]]

    def df(rows: Seq[(Long, Long)]) = rows.toDF("k", "v")
    def snapState(): Unit = modelAt += model.toMap
    def check(step: String): Unit = {
      val got =
        if (TxLog.liveFiles(spark, dir).isEmpty) Seq.empty[(Long, Long)]
        else TxLog.snapshot(spark, dir).select("k", "v")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
      val want = model.toSeq.sorted
      assert(got == want,
        s"$step: snapshot ${got.length} rows != model ${want.length}")
    }

    TxLog.convert(spark, dir)
    snapState()

    def append(): Unit = {
      val rows = (0 until (5 + rnd.nextInt(15)))
        .map { _ => nextKey += 1; (nextKey, rnd.nextLong(1000)) }
      graft.streaming.TxLogIngest.appendSink(dir)(df(rows),
        TxLog.currentVersion(spark, dir).toLong + 1000)
      rows.foreach { case (k, v) => model(k) = v }
    }

    def dvDelete(): Unit = {
      if (model.isEmpty) return
      val ks = model.keys.toSeq.sorted
      val lo = ks(rnd.nextInt(ks.length))
      val hi = lo + rnd.nextInt(12)
      DeletionVectors.delete(spark, dir, col("k").between(lo, hi))
      model.filterInPlace((k, _) => k < lo || k > hi)
    }

    def morUpsert(): Unit = {
      if (model.isEmpty) return
      val ks = model.keys.toSeq.sorted
      val existing = (0 until 3).map(_ => ks(rnd.nextInt(ks.length))).distinct
      val fresh = (0 until 2).map { _ => nextKey += 1; nextKey }
      val rows = (existing ++ fresh).map(k => (k, rnd.nextLong(1000)))
      DeletionVectors.upsert(spark, dir, df(rows), Seq("k"))
      rows.foreach { case (k, v) => model(k) = v }
    }

    def fold(): Unit =
      if (rnd.nextBoolean()) DeletionVectors.materialize(spark, dir)
      else DeletionVectors.materializeWhere(spark, dir, 0.3)

    def restore(): Unit = {
      val v = rnd.nextInt(modelAt.length)
      TxLog.restore(spark, dir, v)
      model.clear()
      modelAt(v).foreach { case (k, x) => model(k) = x }
    }

    append(); snapState(); check("seed append")
    (0 until 15).foreach { i =>
      val before = TxLog.currentVersion(spark, dir)
      rnd.nextInt(6) match {
        case 0 => append()
        case 1 | 2 => dvDelete()
        case 3 => morUpsert()
        case 4 => fold()
        case 5 => restore()
      }
      (before until TxLog.currentVersion(spark, dir)).foreach(_ => snapState())
      check(s"op $i")
    }

    // the change-feed property: for random version pairs, diff must be
    // exactly the model delta — DV-only commits included (a vector
    // attach changes no file name, but its rows must still feed out)
    (0 until 4).foreach { _ =>
      val a = rnd.nextInt(modelAt.length - 1)
      val b = a + 1 + rnd.nextInt(modelAt.length - 1 - a)
      val d = TxLog.diff(spark, dir, a, b)
        .select("k", "v", "_change_type").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val ins = d.filter(_._3 == "insert").map(t => (t._1, t._2)).sorted.toSeq
      val del = d.filter(_._3 == "delete").map(t => (t._1, t._2)).sorted.toSeq
      val ma = modelAt(a).toSet; val mb = modelAt(b).toSet
      assert(ins == (mb -- ma).toSeq.sorted, s"diff($a,$b) inserts")
      assert(del == (ma -- mb).toSeq.sorted, s"diff($a,$b) deletes")
    }

    // vectors survive vacuum's retention sweep; the state stays exact
    TxLog.vacuum(spark, dir, retainVersions = 2)
    check("post-vacuum")
  }

  test("DbLog database: 12 random multi-table transactions, every cut consistent") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val db = Files.createTempDirectory("dbmodel").toString + "/db"

    // model: one key->value map per table; every committed version
    // snapshots BOTH (a cut is a pair — that's the property under test)
    val mA = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    val mB = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    var nextKey = 0L
    val modelAt =
      scala.collection.mutable.ArrayBuffer.empty[(Map[Long, Long], Map[Long, Long])]

    def df(rows: Seq[(Long, Long)]) = rows.toDF("k", "v")
    def snapState(): Unit = modelAt += ((mA.toMap, mB.toMap))
    def read(table: String, v: Int): Seq[(Long, Long)] =
      if (!DbLog.tables(spark, db, v).contains(table)) Nil
      else DbLog.snapshot(spark, db, table, v).select("k", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    def check(step: String): Unit = {
      val v = DbLog.currentVersion(spark, db)
      assert(read("ta", v) == mA.toSeq.sorted, s"$step: ta != model")
      assert(read("tb", v) == mB.toSeq.sorted, s"$step: tb != model")
    }

    DbLog.create(spark, db)
    snapState() // v0: both empty

    def freshRows(n: Int): Seq[(Long, Long)] =
      (0 until n).map { _ => nextKey += 1; (nextKey, rnd.nextLong(1000)) }

    def appendBoth(): Unit = {
      val ra = freshRows(3 + rnd.nextInt(8))
      val rb = freshRows(3 + rnd.nextInt(8))
      DbLog.transact(spark, db, "append-both") { txn =>
        txn.append("ta", df(ra)); txn.append("tb", df(rb))
      }
      ra.foreach { case (k, x) => mA(k) = x }
      rb.foreach { case (k, x) => mB(k) = x }
    }

    def moveRange(): Unit = {
      if (mA.isEmpty) { appendBoth(); return }
      val ks = mA.keys.toSeq.sorted
      val lo = ks(rnd.nextInt(ks.length))
      val hi = lo + rnd.nextInt(12)
      DbLog.transact(spark, db, "move") { txn =>
        txn.append("tb",
          txn.table("ta").filter(col("k") >= lo && col("k") <= hi))
        txn.deleteWhere("ta", col("k") >= lo && col("k") <= hi)
      }
      val moved = mA.filter { case (k, _) => k >= lo && k <= hi }
      moved.foreach { case (k, x) => mB(k) = x }
      mA.filterInPlace((k, _) => k < lo || k > hi)
    }

    def deleteB(): Unit = {
      if (mB.isEmpty) { appendBoth(); return }
      val ks = mB.keys.toSeq.sorted
      val lo = ks(rnd.nextInt(ks.length))
      val hi = lo + rnd.nextInt(12)
      DbLog.transact(spark, db, "trim-b")(
        _.deleteWhere("tb", col("k") >= lo && col("k") <= hi))
      mB.filterInPlace((k, _) => k < lo || k > hi)
    }

    appendBoth(); snapState(); check("seed")
    (0 until 12).foreach { i =>
      val before = DbLog.currentVersion(spark, db)
      rnd.nextInt(4) match {
        case 0 | 1 => appendBoth()
        case 2 => moveRange()
        case 3 => deleteB()
      }
      // every transaction is exactly ONE commit, however many tables
      assert(DbLog.currentVersion(spark, db) == before + 1, s"op $i commits")
      snapState(); check(s"op $i")
    }

    // whole-database time travel: random versions reconstruct the PAIR
    (0 until 6).foreach { _ =>
      val v = rnd.nextInt(modelAt.length)
      val (wa, wb) = modelAt(v)
      assert(read("ta", v) == wa.toSeq.sorted, s"cut v$v: ta")
      assert(read("tb", v) == wb.toSeq.sorted, s"cut v$v: tb")
      // conservation at every cut: moves never lose or double a key
      val (ga, gb) = (read("ta", v).toMap, read("tb", v).toMap)
      assert(ga.keySet.intersect(gb.keySet).isEmpty, s"cut v$v: key in both")
    }

    TxLog.vacuum(spark, db, retainVersions = 2)
    check("post-vacuum")
  }

  test("branched table: 18 random ops across main and a branch, both sides == their models") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    val dir = Files.createTempDirectory("txmodel_branch").toString + "/t"

    // two models: MAIN, and the open branch (None = no branch). While
    // a branch is open, main only APPENDS (the documented clean-merge
    // case) — fresh keys are globally unique, so publish must produce
    // exactly branchModel ∪ (main appends since the fork).
    val mMain = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    var branch: Option[scala.collection.mutable.LinkedHashMap[Long, Long]] = None
    var forkKeys: Set[Long] = Set.empty
    var nextKey = 0L
    var published = 0

    def df(rows: Seq[(Long, Long)]) = rows.toDF("k", "v")
    def freshRows(n: Int): Seq[(Long, Long)] =
      (0 until n).map { _ => nextKey += 1; (nextKey, rnd.nextLong(1000)) }
    def readState(): Seq[(Long, Long)] =
      if (TxLog.liveFiles(spark, dir).isEmpty) Nil
      else TxLog.snapshot(spark, dir).select("k", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    def check(step: String): Unit = {
      assert(readState() == mMain.toSeq.sorted, s"$step: MAIN != model")
      branch.foreach { mBr =>
        val got = TxLog.withBranch(spark, dir, "wip")(readState())
        assert(got == mBr.toSeq.sorted, s"$step: BRANCH != model")
      }
    }

    TxLog.convert(spark, dir)
    val seed = freshRows(12)
    TxLog.append(spark, dir, df(seed))
    seed.foreach { case (k, v) => mMain(k) = v }
    check("seed")

    def mainAppend(): Unit = {
      val rows = freshRows(3 + rnd.nextInt(6))
      TxLog.append(spark, dir, df(rows))
      rows.foreach { case (k, v) => mMain(k) = v }
    }
    def fork(): Unit = {
      TxLog.createBranch(spark, dir, "wip")
      branch = Some(mMain.clone())
      forkKeys = mMain.keySet.toSet
    }
    def branchOp(mBr: scala.collection.mutable.LinkedHashMap[Long, Long]): Unit =
      TxLog.withBranch(spark, dir, "wip") {
        rnd.nextInt(3) match {
          case 0 =>
            val rows = freshRows(2 + rnd.nextInt(5))
            TxLog.append(spark, dir, df(rows))
            rows.foreach { case (k, v) => mBr(k) = v }
          case 1 =>
            if (mBr.nonEmpty) {
              val ks = mBr.keys.toSeq.sorted
              val lo = ks(rnd.nextInt(ks.length)); val hi = lo + rnd.nextInt(8)
              DeletionVectors.delete(spark, dir, col("k").between(lo, hi))
              mBr.filterInPlace((k, _) => k < lo || k > hi)
            }
          case 2 =>
            if (mBr.nonEmpty) {
              val ks = mBr.keys.toSeq.sorted
              val existing = (0 until 2).map(_ => ks(rnd.nextInt(ks.length))).distinct
              val rows = (existing ++ freshRows(1).map(_._1))
                .map(k => (k, rnd.nextLong(1000)))
              DeletionVectors.upsert(spark, dir, df(rows), Seq("k"))
              rows.foreach { case (k, v) => mBr(k) = v }
            }
        }
      }
    def close(mBr: scala.collection.mutable.LinkedHashMap[Long, Long]): Unit =
      if (rnd.nextInt(4) == 0) { // abandon
        TxLog.deleteBranch(spark, dir, "wip")
        branch = None
      } else {
        TxLog.publishBranch(spark, dir, "wip")
        published += 1
        // publish = branch state ∪ main appends since the fork
        val appended = mMain.filter { case (k, _) => !forkKeys(k) }
        mMain.clear()
        mBr.foreach { case (k, v) => mMain(k) = v }
        appended.foreach { case (k, v) => mMain(k) = v }
        branch = None
      }

    (0 until 18).foreach { i =>
      branch match {
        case None =>
          rnd.nextInt(3) match {
            case 0 => mainAppend()
            case _ => fork()
          }
        case Some(mBr) =>
          rnd.nextInt(5) match {
            case 0 => mainAppend() // concurrent main write under an open branch
            case 1 => close(mBr)
            case _ => branchOp(mBr)
          }
      }
      check(s"op $i")
    }
    // drain: publish or drop whatever is open, then vacuum — branch
    // bookkeeping must leave main exactly at its model
    branch.foreach(close)
    branch.foreach(_ => ()) // close may have abandoned; re-check below
    assert(published > 0, "seeded sequence must exercise publish")
    TxLog.vacuum(spark, dir, retainVersions = 2, sweepOrphansOlderThanMs = 0)
    check("post-vacuum")
  }

  test("partitioned + stats-carrying table: 12 random ops, snapshot == model, log-pruned reads exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dir = Files.createTempDirectory("txmodel_hive").toString + "/t"

    // model: key -> value; partition is DERIVED (p = k % 3), so the
    // hive layout, the path-encoded column and the row data must all
    // stay consistent through every operator mix
    val model = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    var nextKey = 0L
    val modelAt = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Long]]
    def hdf(rows: Seq[(Long, Long)]) = rows.toDF("k", "v")
      .withColumn("p", pmod(col("k"), lit(3)).cast("int"))

    def check(step: String): Unit = {
      val got = TxLog.snapshot(spark, dir).select("k", "v", "p")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
      val want = model.toSeq.map { case (k, v) => (k, v, (k % 3).toInt) }.sorted
      assert(got == want, s"$step: snapshot ${got.length} != model ${want.length}")
      // and the LOG-planned pruned read agrees with the model filter —
      // the ADD-carried stats stay sound through upserts, deletes,
      // compactions and restores
      if (model.nonEmpty) {
        val ks = model.keys.toSeq.sorted
        val lo = ks(rnd.nextInt(ks.length))
        val hi = lo + rnd.nextInt(20)
        val pruned = TxLog.snapshotPruned(spark, dir, "k", lo.toDouble, hi.toDouble)
          .select("k", "v").collect().map(r => r.getLong(0) -> r.getLong(1))
          .sorted.toSeq
        val wantP = model.toSeq.filter(kv => kv._1 >= lo && kv._1 <= hi).sorted
        assert(pruned == wantP, s"$step: pruned read ${pruned.length} != ${wantP.length}")
      }
    }

    // seed a 3-partition layout, convert, declare stats
    val seed = (0 until 40).map { _ => nextKey += 1; (nextKey, rnd.nextLong(1000)) }
    hdf(seed).repartition(2).write.partitionBy("p").parquet(dir)
    seed.foreach { case (k, v) => model(k) = v }
    TxLog.convert(spark, dir)
    TxLog.setStatsColumns(spark, dir, Seq("k"))
    modelAt += model.toMap
    check("seed")

    def upsert(): Unit = {
      val ks = model.keys.toSeq.sorted
      val existing = (0 until 3).map(_ => ks(rnd.nextInt(ks.length))).distinct
      val fresh = (0 until 2).map { _ => nextKey += 1; nextKey }
      val rows = (existing ++ fresh).map(k => (k, rnd.nextLong(1000)))
      UpsertWhere.byKeys(spark, dir, "k", hdf(rows), None)
      rows.foreach { case (k, v) => model(k) = v }
    }
    def deleteKeys(): Unit = {
      val ks = model.keys.toSeq.sorted
      val doomed = (0 until 1 + rnd.nextInt(4))
        .map(_ => ks(rnd.nextInt(ks.length))).distinct
      DeleteWhere.byKeysDistributed(spark, dir, "k", doomed.toDF("k"), None)
      doomed.foreach(model -= _)
    }
    def deleteRange(): Unit = {
      val ks = model.keys.toSeq.sorted
      val lo = ks(rnd.nextInt(ks.length)); val hi = lo + rnd.nextInt(8)
      DeleteWhere.range(spark, dir, "k", lo.toDouble, hi.toDouble, None)
      model.filterInPlace((k, _) => k < lo || k > hi)
    }
    def compactAll(): Unit =
      Compact.binPack(spark, dir, targetBytes = 64L << 20, smallBytes = 64L << 20)
    def restore(): Unit = {
      val v = rnd.nextInt(modelAt.length)
      TxLog.restore(spark, dir, v)
      model.clear(); modelAt(v).foreach { case (k, x) => model(k) = x }
    }

    (0 until 12).foreach { i =>
      val before = TxLog.currentVersion(spark, dir)
      rnd.nextInt(6) match {
        case 0 | 1 => upsert()
        case 2 => deleteKeys()
        case 3 => deleteRange()
        case 4 => compactAll()
        case 5 => restore()
      }
      (before until TxLog.currentVersion(spark, dir))
        .foreach(_ => modelAt += model.toMap)
      check(s"op $i")
    }
    TxLog.vacuum(spark, dir, retainVersions = 2)
    check("post-vacuum")
  }

  test("shallow clone: 16 random ops across source AND clone, both models exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    val srcDir = Files.createTempDirectory("clonemodel").toString + "/src"
    val dstDir = Files.createTempDirectory("clonemodel").toString + "/dst"

    val mSrc = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    val mDst = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    var nextKey = 0L

    def df(rows: Seq[(Long, Long)]) = rows.toDF("k", "v")
    def read(dir: String): Seq[(Long, Long)] =
      if (TxLog.liveFiles(spark, dir).isEmpty) Nil
      else TxLog.snapshot(spark, dir).select("k", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    def check(step: String): Unit = {
      assert(read(srcDir) == mSrc.toSeq.sorted, s"$step: source != model")
      assert(read(dstDir) == mDst.toSeq.sorted, s"$step: clone != model")
    }

    def append(dir: String, m: scala.collection.mutable.Map[Long, Long]): Unit = {
      val rows = (0 until (5 + rnd.nextInt(15)))
        .map { _ => nextKey += 1; (nextKey, rnd.nextLong(1000)) }
      graft.streaming.TxLogIngest.appendSink(dir)(df(rows),
        TxLog.currentVersion(spark, dir).toLong + 1000)
      rows.foreach { case (k, v) => m(k) = v }
    }
    def cowDelete(dir: String, m: scala.collection.mutable.Map[Long, Long]): Unit = {
      if (m.isEmpty) return
      val ks = m.keys.toSeq.sorted
      val lo = ks(rnd.nextInt(ks.length)); val hi = lo + rnd.nextInt(10)
      DeleteWhere.range(spark, dir, "k", lo.toDouble, hi.toDouble, None)
      m.filterInPlace((k, _) => k < lo || k > hi)
    }
    def dvDelete(dir: String, m: scala.collection.mutable.Map[Long, Long]): Unit = {
      if (m.isEmpty) return
      val ks = m.keys.toSeq.sorted
      val lo = ks(rnd.nextInt(ks.length)); val hi = lo + rnd.nextInt(10)
      DeletionVectors.delete(spark, dir, col("k").between(lo, hi))
      m.filterInPlace((k, _) => k < lo || k > hi)
    }
    def morUpsert(dir: String, m: scala.collection.mutable.Map[Long, Long]): Unit = {
      if (m.isEmpty) return
      val ks = m.keys.toSeq.sorted
      val existing = (0 until 3).map(_ => ks(rnd.nextInt(ks.length))).distinct
      val fresh = (0 until 2).map { _ => nextKey += 1; nextKey }
      val rows = (existing ++ fresh).map(k => (k, rnd.nextLong(1000)))
      DeletionVectors.upsert(spark, dir, df(rows), Seq("k"))
      rows.foreach { case (k, v) => m(k) = v }
    }

    // seed the source with history worth inheriting: appends + a DV
    TxLog.convert(spark, srcDir)
    append(srcDir, mSrc); append(srcDir, mSrc)
    dvDelete(srcDir, mSrc)
    TxLog.cloneTo(spark, srcDir, dstDir)
    mDst ++= mSrc
    check("post-clone")

    (0 until 16).foreach { i =>
      val (dir, m) =
        if (rnd.nextBoolean()) (srcDir, mSrc) else (dstDir, mDst)
      rnd.nextInt(6) match {
        case 0 => append(dir, m)
        case 1 => cowDelete(dir, m)
        case 2 | 3 => dvDelete(dir, m)
        case 4 => morUpsert(dir, m)
        case 5 => if (dir == dstDir) {
          TxLog.localize(spark, dstDir) // detach mid-history, then go on
        } else Compact.binPack(spark, dir,
          targetBytes = 64L << 20, smallBytes = 64L << 20)
      }
      check(s"op $i")
    }
    // end state: detach fully, vacuum both, delete the source — the
    // clone must survive on its model exactly
    TxLog.localize(spark, dstDir)
    TxLog.vacuum(spark, srcDir, retainVersions = 1)
    TxLog.vacuum(spark, dstDir, retainVersions = 1)
    check("post-vacuum")
    Compact.fsOf(spark, srcDir)
      .delete(new org.apache.hadoop.fs.Path(srcDir), true)
    assert(read(dstDir) == mDst.toSeq.sorted, "clone must survive source loss")
  }
}
