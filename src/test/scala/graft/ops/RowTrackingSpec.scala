package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row tracking ([[RowTracking]]): stable `_row_id`s assigned from the
  * kernel-atomic ledger, position-derived for fresh files, materialized
  * through every rewrite (compaction, CoW delete/update, MOR upsert,
  * SQL MERGE, DV materialize, clone localize), stable across RESTORE,
  * hidden from normal reads, and powering keyless CDF update-image
  * pairing.
  */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  /** keyed (k → _row_id) map of the current tracked snapshot */
  private def ids(dir: String): Map[Long, Long] =
    RowTracking.read(spark, dir)
      .select(col("k"), col(RowTracking.Col))
      .as[(Long, Long)].collect().toMap

  private def fresh(n: Int = 20, files: Int = 2): String = {
    val dir = Files.createTempDirectory("rowtrk").toString + "/t"
    val df = (1L to n.toLong).map(k => (k, s"v$k")).toDF("k", "v")
    // deterministic layout: `files` single-sorted-partition appends
    TxLog.convert(spark, dir)
    TxLog.setTableSchema(spark, dir, df.schema, 0)
    RowTracking.enable(spark, dir)
    (0 until files).foreach { i =>
      TxLog.append(spark, dir,
        df.filter(col("k") % files === i)
          .repartition(1).sortWithinPartitions("k"))
    }
    dir
  }

  test("a seen entry REMOVED by a concurrent commit conflicts (no resurrection via re-ADD)") {
    val dir = fresh()
    val entry = TxLog.liveEntries(spark, dir).head
    // enable()'s backfill shape: re-ADD a seen entry with removes=Nil.
    // Simulate a racing compaction landing FIRST: the seen file is
    // gone, so committing the re-ADD would resurrect its rows beside
    // their packed copies — it must conflict instead.
    Compact.binPack(spark, dir,
      targetBytes = 256L << 20, smallBytes = 256L << 20)
    assert(!TxLog.liveEntries(spark, dir).exists(_.name == entry.name))
    intercept[java.util.ConcurrentModificationException] {
      TxLog.commitEntries(spark, dir,
        adds = Seq(entry.copy(rowBase = Some(1000000L))),
        removes = Nil, seen = Seq(entry), op = Some("test-backfill"))
    }
  }

  test("readAt on a created-empty tracked table reads empty (keyless CDC's initial batch)") {
    val dir = Files.createTempDirectory("rowtrk_empty").toString + "/t"
    TxLog.convert(spark, dir)
    TxLog.setTableSchema(spark, dir,
      Seq((1L, "a")).toDF("k", "v").schema, 0)
    RowTracking.enable(spark, dir)
    val got = RowTracking.readAt(spark, dir, 0)
    assert(got.isEmpty)
    assert(got.columns.toSet ==
      Set("k", "v", RowTracking.Col, RowTracking.VerCol))
  }

  test("fresh appends: position-derived ids, dense per file, unique; hidden from plain reads") {
    val dir = fresh(20, 2)
    val got = RowTracking.read(spark, dir)
    assert(got.count() == 20L)
    assert(got.select(RowTracking.Col).distinct().count() == 20L)
    // first file claimed [0, 10), second [10, 20)
    assert(got.agg(min(RowTracking.Col), max(RowTracking.Col)).head() ==
      org.apache.spark.sql.Row(0L, 19L))
    // the id column is NOT part of the normal table surface
    assert(!TxLog.snapshot(spark, dir).columns.contains(RowTracking.Col))
    assert(!TxLog.snapshot(spark, dir).columns.contains(RowTracking.MatCol))
  }

  test("enable on an existing table backfills ids without moving data") {
    val dir = Files.createTempDirectory("rowtrk").toString + "/t"
    (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(2).write.parquet(dir)
    TxLog.convert(spark, dir)
    val filesBefore = TxLog.liveFiles(spark, dir).toSet
    RowTracking.enable(spark, dir)
    assert(TxLog.liveFiles(spark, dir).toSet == filesBefore) // no data moved
    val got = RowTracking.read(spark, dir)
    assert(got.count() == 10L)
    assert(got.select(RowTracking.Col).distinct().count() == 10L)
    RowTracking.enable(spark, dir) // idempotent
    assert(RowTracking.read(spark, dir).count() == 10L)
  }

  test("copy-on-write delete: survivors keep their ids") {
    val dir = fresh()
    val before = ids(dir)
    DeleteWhere.where(spark, dir, col("k") % 3 === 0)
    val after = ids(dir)
    assert(after.keySet == before.keySet.filterNot(_ % 3 == 0))
    after.foreach { case (k, id) => assert(id == before(k)) }
  }

  test("copy-on-write update: updated rows keep their ids") {
    val dir = fresh()
    val before = ids(dir)
    DeleteWhere.updateWhere(spark, dir, col("k") <= 5,
      Seq("v" -> lit("upd")))
    val got = RowTracking.read(spark, dir)
    assert(got.filter(col("v") === "upd").count() == 5L)
    ids(dir).foreach { case (k, id) => assert(id == before(k)) }
  }

  test("compaction: packed rows keep their ids; keyless CDF sees nothing") {
    val dir = fresh(40, 4)
    val before = ids(dir)
    val vBefore = TxLog.currentVersion(spark, dir)
    val r = Compact.binPack(spark, dir, smallBytes = 1L << 20)
    assert(r.packed >= 2)
    ids(dir).foreach { case (k, id) => assert(id == before(k)) }
    // a pure compaction contributes NOTHING to the row-id-paired feed
    val feed = TxLog.changes(spark, dir, vBefore,
      TxLog.currentVersion(spark, dir), keyCols = Nil)
    assert(feed.count() == 0L)
  }

  test("DV delete hides ids; materialize folds them as data; ids stable") {
    val dir = fresh()
    val before = ids(dir)
    DeletionVectors.delete(spark, dir, col("k") > 15)
    val mid = ids(dir)
    assert(mid.keySet == before.keySet.filter(_ <= 15))
    mid.foreach { case (k, id) => assert(id == before(k)) }
    DeletionVectors.materialize(spark, dir)
    assert(TxLog.liveEntries(spark, dir).forall(_.dv.isEmpty))
    ids(dir).foreach { case (k, id) => assert(id == before(k)) }
  }

  test("MOR upsert: matched rows keep ids, inserts draw fresh") {
    val dir = fresh()
    val before = ids(dir)
    DeletionVectors.upsert(spark, dir,
      Seq((3L, "u3"), (7L, "u7"), (100L, "new")).toDF("k", "v"),
      keyCols = Seq("k"))
    val after = ids(dir)
    assert(after(3L) == before(3L) && after(7L) == before(7L))
    assert(after(100L) > before.values.max) // fresh, above everything
    assert(after.values.toSeq.distinct.size == after.size)
  }

  test("SQL MERGE: update images inherit ids, inserts draw fresh") {
    val dir = fresh()
    val before = ids(dir)
    Seq((2L, "m2"), (4L, "m4"), (200L, "mnew"))
      .toDF("k", "v").createOrReplaceTempView("rowtrk_src")
    graft.plans.GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dir` AS t USING rowtrk_src AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = ids(dir)
    assert(after(2L) == before(2L) && after(4L) == before(4L))
    assert(RowTracking.read(spark, dir)
      .filter(col("k") === 2L).head().getAs[String]("v") == "m2")
    assert(after(200L) > before.values.max)
    assert(after.values.toSeq.distinct.size == after.size)
  }

  test("RESTORE is id-stable (bases travel with the entries)") {
    val dir = fresh()
    val before = ids(dir)
    val v = TxLog.currentVersion(spark, dir)
    DeletionVectors.upsert(spark, dir,
      Seq((5L, "u5"), (300L, "n")).toDF("k", "v"), keyCols = Seq("k"))
    TxLog.restore(spark, dir, v)
    assert(ids(dir) == before)
  }

  test("clone: inherited rows keep source ids; clone allocations start past the source water; localize preserves") {
    val dir = fresh()
    val srcIds = ids(dir)
    val dst = Files.createTempDirectory("rowtrk").toString + "/c"
    TxLog.cloneTo(spark, dir, dst)
    assert(ids(dst) == srcIds)
    // the clone's own appends never collide with inherited ids
    TxLog.append(spark, dst,
      Seq((500L, "c1"), (501L, "c2")).toDF("k", "v").repartition(1))
    val cloneIds = ids(dst)
    assert(cloneIds.values.toSeq.distinct.size == cloneIds.size)
    assert(cloneIds(500L) > srcIds.values.max)
    // localize folds based entries to local files — ids travel
    TxLog.localize(spark, dst)
    assert(TxLog.liveEntries(spark, dst).forall(_.base.isEmpty))
    assert(ids(dst) == cloneIds)
  }

  test("keyless CDF: update images pair by _row_id and match the keyed run") {
    val dir = fresh()
    val v0 = TxLog.currentVersion(spark, dir)
    DeletionVectors.upsert(spark, dir,
      Seq((3L, "u3"), (400L, "ins")).toDF("k", "v"), keyCols = Seq("k"))
    DeleteWhere.where(spark, dir, col("k") === 8L)
    val v1 = TxLog.currentVersion(spark, dir)
    val keyless = TxLog.changes(spark, dir, v0, v1, keyCols = Nil)
      .drop(RowTracking.Col)
    val keyed = TxLog.changes(spark, dir, v0, v1, keyCols = Seq("k"))
    def canon(df: DataFrame) = df
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Int)].collect().toSet
    assert(canon(keyless) == canon(keyed))
    assert(canon(keyless).exists(_._3 == "update_preimage"))
    assert(canon(keyless).exists(_._3 == "update_postimage"))
    assert(canon(keyless).exists(_._3 == "insert"))
    assert(canon(keyless).exists(_._3 == "delete"))
  }

  test("keyless CDF without tracking refuses with the fix") {
    val dir = Files.createTempDirectory("rowtrk").toString + "/t"
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    TxLog.convert(spark, dir)
    val e = intercept[IllegalArgumentException] {
      TxLog.changes(spark, dir, 0, 0, keyCols = Nil)
    }
    assert(e.getMessage.contains("row tracking"))
  }

  test("racing appends claim disjoint id ranges") {
    val dir = fresh(4, 1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence((0 until 6).map(i => Future {
      TxLog.append(spark, dir,
        (0 until 50).map(j => (1000L + i * 100 + j, s"r$i-$j"))
          .toDF("k", "v"))
    })), 180.seconds)
    val got = RowTracking.read(spark, dir)
    assert(got.count() == 304L)
    assert(got.select(RowTracking.Col).distinct().count() == 304L)
  }

  test("_row_commit_version: born at the landing commit, bumped only by modification") {
    val dir = fresh(20, 2) // appends land at v1 and v2
    def vers(): Map[Long, Long] = RowTracking.read(spark, dir)
      .select(col("k"), col(RowTracking.VerCol))
      .as[(Long, Long)].collect().toMap
    val born = vers()
    assert(born.values.toSet == Set(1L, 2L)) // two appends, two commits
    // compaction MOVES rows without modifying them: versions frozen
    Compact.binPack(spark, dir, smallBytes = 1L << 20) // v3
    assert(vers() == born)
    // CoW update: hit rows take THIS commit, others keep theirs
    DeleteWhere.updateWhere(spark, dir, col("k") <= 5,
      Seq("v" -> lit("upd"))) // v4
    val afterUpd = vers()
    afterUpd.foreach { case (k, ver) =>
      assert(ver == (if (k <= 5) 4L else born(k)), s"k=$k ver=$ver")
    }
    // CoW delete: survivors are NOT modified
    DeleteWhere.where(spark, dir, col("k") % 3 === 0) // v5
    vers().foreach { case (k, ver) => assert(ver == afterUpd(k)) }
    // MOR upsert: updated rows take the upsert commit, inserts born at it
    DeletionVectors.upsert(spark, dir,
      Seq((7L, "u7"), (500L, "new")).toDF("k", "v"),
      keyCols = Seq("k")) // v6
    val fin = vers()
    assert(fin(7L) == 6L && fin(500L) == 6L)
    fin.removedAll(Seq(7L, 500L)).foreach { case (k, ver) =>
      assert(ver == afterUpd(k))
    }
    // ids never moved through any of it
    val got = RowTracking.read(spark, dir)
    assert(got.select(RowTracking.Col).distinct().count() == got.count())
  }

  test("replicateByRowId: keyless feed applies, compaction is a no-op hop, a source rename follows") {
    val src = fresh(30, 3)
    val dst = Files.createTempDirectory("rowtrk_repl").toString + "/r"
    // first sync: full resync, ids ride as a data column
    assert(TxLog.replicateByRowId(spark, src, dst)._1 == -1)
    assert(TxLog.snapshot(spark, dst)
      .select(col("k"), col(RowTracking.Col))
      .as[(Long, Long)].collect().toMap == ids(src))
    // churn on the source: MOR upsert + CoW delete, one advance
    DeletionVectors.upsert(spark, src,
      TxLog.snapshot(spark, src).filter(col("k") <= 5)
        .withColumn("v", lit("UP")).localCheckpoint(),
      keyCols = Seq("k"))
    DeleteWhere.where(spark, src, col("k") % 7 === 0)
    val (f1, t1) = TxLog.replicateByRowId(spark, src, dst)
    assert(t1 == TxLog.currentVersion(spark, src) && f1 < t1)
    def state(dir: String) = TxLog.snapshot(spark, dir)
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(state(dst) == state(src))
    assert(TxLog.snapshot(spark, dst)
      .select(col("k"), col(RowTracking.Col))
      .as[(Long, Long)].collect().toMap == ids(src)) // ids preserved
    // compaction: identical (row, id) pairs net to an EMPTY feed —
    // the advance is a pure cursor hop, the replica commits nothing
    val dstV = TxLog.currentVersion(spark, dst)
    Compact.binPack(spark, src,
      targetBytes = 256L << 20, smallBytes = 256L << 20)
    TxLog.replicateByRowId(spark, src, dst)
    assert(TxLog.currentVersion(spark, dst) == dstV)
    // a mapped RENAME on the source mid-stream: the replica follows
    // the spelling (physical-identity diff of the source pins) and
    // the id key is untouched by construction
    ColumnMapping.renameColumn(spark, src, "v", "name")
    TxLog.append(spark, src,
      Seq((100L, "new")).toDF("k", "name").repartition(1))
    // the SQL procedure surface drives this advance
    graft.GraftExtensions.installInto(spark)
    spark.sql(s"SELECT * FROM graft_replicate_rowid('$src', '$dst')")
      .collect()
    val rep = TxLog.snapshot(spark, dst)
    assert(rep.columns.contains("name") && !rep.columns.contains("v"))
    assert(rep.select("k", "name").as[(Long, String)].collect().toSet ==
      TxLog.snapshot(spark, src).select("k", "name")
        .as[(Long, String)].collect().toSet)
    assert(rep.select(col("k"), col(RowTracking.Col))
      .as[(Long, Long)].collect().toMap == ids(src))
    // untracked source refuses with the fix
    val plain = Files.createTempDirectory("rowtrk_plain").toString + "/t"
    Seq((1L, "a")).toDF("k", "v").write.parquet(plain)
    TxLog.convert(spark, plain)
    val e = intercept[IllegalArgumentException] {
      TxLog.replicateByRowId(spark, plain, dst + "2")
    }
    assert(e.getMessage.contains("row tracking"))
  }

  test("replicateByRowId: ADD then DROP on the source follow into the replica; a swap refuses") {
    val src = fresh(12, 2)
    val dst = Files.createTempDirectory("rowtrk_repl2").toString + "/r"
    TxLog.replicateByRowId(spark, src, dst)
    // ADD COLUMN on the source + a commit carrying it: the keyless
    // feed (range-end pin) widens the replica through applyChanges
    ColumnMapping.addColumn(spark, src,
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType, nullable = true))
    TxLog.append(spark, src,
      Seq((50L, "n", 500L)).toDF("k", "v", "w").repartition(1))
    TxLog.replicateByRowId(spark, src, dst)
    assert(TxLog.snapshot(spark, dst).columns.contains("w"))
    assert(TxLog.snapshot(spark, dst).filter(col("k") === 50L)
      .head().getAs[Long]("w") == 500L)
    // DROP on the source: the feed no longer carries w — the replica
    // must drop it too instead of wedging on a missing feed column
    ColumnMapping.dropColumn(spark, src, "w")
    TxLog.append(spark, src,
      Seq((51L, "m")).toDF("k", "v").repartition(1))
    TxLog.replicateByRowId(spark, src, dst)
    val rep = TxLog.snapshot(spark, dst)
    assert(!rep.columns.contains("w"))
    assert(rep.select("k", "v").as[(Long, String)].collect().toSet ==
      TxLog.snapshot(spark, src).select("k", "v")
        .as[(Long, String)].collect().toSet)
    // a SWAP inside one advance (v<->u via a temp spelling) cannot
    // apply unambiguously — it must refuse, never cross the values
    ColumnMapping.addColumn(spark, src,
      org.apache.spark.sql.types.StructField("u",
        org.apache.spark.sql.types.StringType, nullable = true))
    TxLog.append(spark, src,
      Seq((52L, "x", "ux")).toDF("k", "v", "u").repartition(1))
    TxLog.replicateByRowId(spark, src, dst) // replica now has u
    ColumnMapping.renameColumn(spark, src, "v", "zz_tmp")
    ColumnMapping.renameColumn(spark, src, "u", "v")
    ColumnMapping.renameColumn(spark, src, "zz_tmp", "u")
    TxLog.append(spark, src,
      Seq((53L, "sv", "su")).toDF("k", "v", "u").repartition(1))
    val sw = intercept[IllegalArgumentException] {
      TxLog.replicateByRowId(spark, src, dst)
    }
    assert(sw.getMessage.contains("CYCLE"))
    // and a pure DROP + re-ADD of one name inside a fresh window
    // refuses too (vanished storage, logical name alive)
    val src2 = fresh(6, 1)
    val dst2 = Files.createTempDirectory("rowtrk_repl3").toString + "/r"
    TxLog.replicateByRowId(spark, src2, dst2)
    ColumnMapping.dropColumn(spark, src2, "v")
    ColumnMapping.addColumn(spark, src2,
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType, nullable = true))
    TxLog.append(spark, src2,
      Seq((60L, "re")).toDF("k", "v").repartition(1))
    val dr = intercept[IllegalArgumentException] {
      TxLog.replicateByRowId(spark, src2, dst2)
    }
    assert(dr.getMessage.contains("re-ADDED"))
  }

  test("replicateByRowId autoRecreate: every refusal path heals to the source's exact state") {
    def srcState(src: String) = RowTracking.read(spark, src)
      .drop(RowTracking.VerCol)
    def dstState(dst: String) = TxLog.snapshot(spark, dst)
    def healed(src: String, dst: String): Unit = {
      val s = srcState(src)
      val d = dstState(dst).select(s.columns.map(col): _*)
      assert(d.exceptAll(s).isEmpty && s.exceptAll(d).isEmpty,
        "healed replica must equal the source's id-attached snapshot")
    }
    // 1) swap (rename cycle) inside one window
    val src = fresh(8, 1)
    val dst = Files.createTempDirectory("rowtrk_heal").toString + "/r"
    TxLog.replicateByRowId(spark, src, dst)
    ColumnMapping.addColumn(spark, src,
      org.apache.spark.sql.types.StructField("u",
        org.apache.spark.sql.types.StringType, nullable = true))
    TxLog.append(spark, src,
      Seq((70L, "x", "ux")).toDF("k", "v", "u").repartition(1))
    TxLog.replicateByRowId(spark, src, dst)
    ColumnMapping.renameColumn(spark, src, "v", "zz_tmp")
    ColumnMapping.renameColumn(spark, src, "u", "v")
    ColumnMapping.renameColumn(spark, src, "zz_tmp", "u")
    TxLog.append(spark, src,
      Seq((71L, "sv", "su")).toDF("k", "v", "u").repartition(1))
    intercept[IllegalArgumentException] { // without the flag: refuses
      TxLog.replicateByRowId(spark, src, dst)
    }
    TxLog.replicateByRowId(spark, src, dst, autoRecreate = true)
    healed(src, dst)
    // the healed cursor advances incrementally afterwards
    TxLog.append(spark, src,
      Seq((72L, "post", "heal")).toDF("k", "v", "u").repartition(1))
    val (f2, t2) = TxLog.replicateByRowId(spark, src, dst)
    assert(f2 + 1 == t2)
    healed(src, dst)
    // 2) drop + re-add of one logical name inside one window
    val src2 = fresh(6, 1)
    val dst2 = Files.createTempDirectory("rowtrk_heal2").toString + "/r"
    TxLog.replicateByRowId(spark, src2, dst2)
    ColumnMapping.dropColumn(spark, src2, "v")
    ColumnMapping.addColumn(spark, src2,
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType, nullable = true))
    TxLog.append(spark, src2,
      Seq((80L, "re")).toDF("k", "v").repartition(1))
    TxLog.replicateByRowId(spark, src2, dst2, autoRecreate = true)
    healed(src2, dst2)
    // 3) misaligned resync after a retention cliff: rename past the
    // horizon so the lost range carries no rename record
    val src3 = fresh(6, 1)
    val dst3 = Files.createTempDirectory("rowtrk_heal3").toString + "/r"
    TxLog.replicateByRowId(spark, src3, dst3)
    ColumnMapping.renameColumn(spark, src3, "v", "w")
    (0 until 4).foreach { i =>
      TxLog.append(spark, src3,
        Seq((90L + i, s"t$i")).toDF("k", "w").repartition(1))
    }
    TxLog.vacuum(spark, src3, retainVersions = 2)
    intercept[IllegalArgumentException] { // without the flag: refuses
      TxLog.replicateByRowId(spark, src3, dst3)
    }
    TxLog.replicateByRowId(spark, src3, dst3, autoRecreate = true)
    healed(src3, dst3)
  }

  test("vacuum prunes the ledger; water survives") {
    val dir = fresh(10, 5)
    val w = RowTracking.currentWater(spark, dir)
    TxLog.vacuum(spark, dir, retainVersions = 1)
    assert(RowTracking.currentWater(spark, dir) == w)
    TxLog.append(spark, dir, Seq((900L, "p")).toDF("k", "v"))
    assert(RowTracking.currentWater(spark, dir) == w + 1)
  }
}
