package graft.ops

import java.nio.file.Files

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

/** Branches + write-audit-publish ([[TxLog.createBranch]] /
  * [[TxLog.withBranch]] / [[TxLog.publishBranch]]): branch commits are
  * invisible to main until published; publish is one atomic
  * metadata-only commit that merges with concurrent main appends and
  * detects genuine file-level conflicts.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def table(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("branch").toString + "/t"
    // one file: the conflict tests need branch and main to touch the
    // SAME entry deterministically
    rows.toDF("k", "v").repartition(1).write.parquet(dir)
    TxLog.convert(spark, dir)
    dir
  }

  test("branch writes are invisible to main until publish; branch reads fold base + branch") {
    val dir = table(Seq((1L, "a"), (2L, "b")))
    TxLog.createBranch(spark, dir, "audit")
    TxLog.withBranch(spark, dir, "audit") {
      TxLog.append(spark, dir, Seq((3L, "c")).toDF("k", "v"))
      assert(TxLog.snapshot(spark, dir).count() == 3)
      // branch history = base commits + branch commits, contiguous
      assert(TxLog.currentVersion(spark, dir) == 1)
    }
    // main: unchanged — the branch commit file is not a main version
    assert(TxLog.snapshot(spark, dir).count() == 2)
    assert(TxLog.currentVersion(spark, dir) == 0)
    val v = TxLog.publishBranch(spark, dir, "audit")
    assert(v == 1)
    assert(TxLog.snapshot(spark, dir).count() == 3)
    assert(TxLog.branches(spark, dir).isEmpty) // consumed by default
    // the publish commit is op-tagged
    val ops = TxLog.history(spark, dir).select("operation")
      .as[String].collect().toSeq
    assert(ops.head == "publish(audit)")
  }

  test("every writer is branch-capable: DV delete + keyed upsert on a branch") {
    val dir = table((1L to 10L).map(k => (k, s"v$k")))
    TxLog.createBranch(spark, dir, "wap")
    TxLog.withBranch(spark, dir, "wap") {
      DeletionVectors.delete(spark, dir, col("k") <= 2)
      // merge-on-read upsert: the writer that composes with the DV
      // the delete just attached (CoW byKeys refuses DV files by design)
      DeletionVectors.upsert(spark, dir,
        Seq((5L, "up")).toDF("k", "v"), Seq("k"))
      assert(TxLog.snapshot(spark, dir).count() == 8)
      assert(TxLog.snapshot(spark, dir).where("v = 'up'").count() == 1)
    }
    // main still sees all 10, unmodified
    assert(TxLog.snapshot(spark, dir).count() == 10)
    assert(TxLog.snapshot(spark, dir).where("v = 'up'").count() == 0)
    TxLog.publishBranch(spark, dir, "wap")
    assert(TxLog.snapshot(spark, dir).count() == 8)
    assert(TxLog.snapshot(spark, dir).where("v = 'up'").count() == 1)
  }

  test("audit gate: a failed expectation keeps the branch out of main") {
    val dir = table(Seq((1L, "ok")))
    TxLog.createBranch(spark, dir, "gated")
    TxLog.withBranch(spark, dir, "gated") {
      TxLog.append(spark, dir, Seq((2L, "")).toDF("k", "v"))
    }
    val bad = TxLog.withBranch(spark, dir, "gated") {
      TxLog.snapshot(spark, dir).where("v = ''").count()
    }
    assert(bad == 1) // audit failed → delete instead of publish
    TxLog.deleteBranch(spark, dir, "gated")
    assert(TxLog.snapshot(spark, dir).count() == 1)
    assert(TxLog.branches(spark, dir).isEmpty)
  }

  test("publish merges with a concurrent main append; conflicts on a branch-touched file") {
    val dir = table((1L to 6L).map(k => (k, s"v$k")))
    TxLog.createBranch(spark, dir, "merge")
    TxLog.withBranch(spark, dir, "merge") {
      DeletionVectors.delete(spark, dir, col("k") === 1)
    }
    // concurrent MAIN append after the fork: disjoint files, merges
    TxLog.append(spark, dir, Seq((7L, "v7")).toDF("k", "v"))
    TxLog.publishBranch(spark, dir, "merge")
    val ks = TxLog.snapshot(spark, dir).select("k").as[Long].collect().toSet
    assert(ks == Set(2L, 3L, 4L, 5L, 6L, 7L))

    // now a genuine conflict: branch and main both re-vector the same
    // file — publishing would silently drop main's deletes (the lost
    // update the entry-aware read-set exists to catch)
    TxLog.createBranch(spark, dir, "clash")
    TxLog.withBranch(spark, dir, "clash") {
      DeletionVectors.delete(spark, dir, col("k") === 2)
    }
    DeletionVectors.delete(spark, dir, col("k") === 3) // main, same file
    intercept[java.util.ConcurrentModificationException] {
      TxLog.publishBranch(spark, dir, "clash")
    }
    TxLog.deleteBranch(spark, dir, "clash")
    // main keeps ITS delete; the branch's never landed
    val after = TxLog.snapshot(spark, dir).select("k").as[Long]
      .collect().toSet
    assert(after == Set(2L, 4L, 5L, 6L, 7L))
  }

  test("vacuum protects an open branch: its base and staged files survive") {
    val dir = table(Seq((1L, "a")))
    TxLog.createBranch(spark, dir, "slow")
    TxLog.withBranch(spark, dir, "slow") {
      TxLog.append(spark, dir, Seq((2L, "staged")).toDF("k", "v"))
    }
    // churn main far past retention, then vacuum with orphan sweep
    (1 to 5).foreach(i => UpsertWhere.byKeys(spark, dir, "k",
      Seq((1L, s"w$i")).toDF("k", "v")))
    TxLog.vacuum(spark, dir, retainVersions = 2,
      sweepOrphansOlderThanMs = 0)
    // the branch still reads: base v0 reconstructable, staged file alive
    val rows = TxLog.withBranch(spark, dir, "slow") {
      TxLog.snapshot(spark, dir).collect().toSet
    }
    assert(rows.map(_.getLong(0)) == Set(1L, 2L))
    // after deleteBranch the staged file is an orphan; the sweep takes it
    TxLog.deleteBranch(spark, dir, "slow")
    val before = Compact.dataFilesRecursive(
      Compact.fsOf(spark, dir), dir).size
    TxLog.vacuum(spark, dir, retainVersions = 2,
      sweepOrphansOlderThanMs = 0)
    val after = Compact.dataFilesRecursive(
      Compact.fsOf(spark, dir), dir).size
    assert(after < before)
    assert(TxLog.snapshot(spark, dir).count() == 1) // main unharmed
  }

  test("schema evolution on a branch stays on the branch; publish moves the pin") {
    val dir = table(Seq((1L, "a")))
    TxLog.createBranch(spark, dir, "widen")
    TxLog.withBranch(spark, dir, "widen") {
      DeletionVectors.upsert(spark, dir,
        Seq((2L, "b", 9.5)).toDF("k", "v", "score"), Seq("k"),
        evolveSchema = true)
      assert(TxLog.snapshot(spark, dir).columns.contains("score"))
    }
    // main: no score column, no pin leak
    assert(!TxLog.snapshot(spark, dir).columns.contains("score"))
    assert(TxLog.tableSchema(spark, dir).forall(
      !_.fieldNames.contains("score")))
    val v = TxLog.publishBranch(spark, dir, "widen")
    val snap = TxLog.snapshot(spark, dir)
    assert(snap.columns.contains("score"))
    assert(snap.where("k = 1").select("score").collect().head.isNullAt(0))
    // pre-publish main snapshots keep their original width
    assert(!TxLog.snapshot(spark, dir, v - 1).columns.contains("score"))
  }

  test("branch guards: no nested foreign scope, no checkpoint/tag/vacuum inside, stale base refused") {
    val dir = table(Seq((1L, "a")))
    TxLog.createBranch(spark, dir, "one")
    TxLog.withBranch(spark, dir, "one") {
      intercept[IllegalArgumentException] {
        TxLog.withBranch(spark, dir, "other")(())
      }
      intercept[IllegalArgumentException] { TxLog.checkpoint(spark, dir) }
      intercept[IllegalArgumentException] { TxLog.setTag(spark, dir, "t") }
      intercept[IllegalArgumentException] {
        TxLog.vacuum(spark, dir, retainVersions = 2)
      }
      // re-entry on the SAME branch is fine (composable helpers)
      assert(TxLog.withBranch(spark, dir, "one")(
        TxLog.currentVersion(spark, dir)) == 0)
    }
    intercept[IllegalArgumentException] {
      TxLog.createBranch(spark, dir, "one") // duplicate name
    }
    intercept[IllegalArgumentException] {
      TxLog.createBranch(spark, dir, "bad/name")
    }
  }

  test("maintenance on a branch: binPack packs branch-staged files; publish carries the packed layout") {
    val dir = table(Seq((0L, "seed")))
    TxLog.createBranch(spark, dir, "tidy")
    TxLog.withBranch(spark, dir, "tidy") {
      (1 to 4).foreach(i => TxLog.append(spark, dir,
        Seq((i.toLong, s"v$i")).toDF("k", "v")))
      val before = TxLog.liveFiles(spark, dir).length
      Compact.binPack(spark, dir, targetBytes = 64L << 20,
        smallBytes = 64L << 20)
      assert(TxLog.liveFiles(spark, dir).length < before)
      assert(TxLog.snapshot(spark, dir).count() == 5)
    }
    assert(TxLog.snapshot(spark, dir).count() == 1) // main untouched
    TxLog.publishBranch(spark, dir, "tidy")
    assert(TxLog.snapshot(spark, dir).count() == 5)
    assert(TxLog.liveFiles(spark, dir).length <= 2) // packed layout landed
  }

  test("whole-DATABASE branches compose for free: DbLog transactions on a branch, one publish") {
    val db = Files.createTempDirectory("branchdb").toString + "/db"
    DbLog.create(spark, db) // v0
    DbLog.transact(spark, db, "seed") { txn =>
      txn.append("orders", (1L to 6L).map(k => (k, s"o$k")).toDF("k", "v"))
      txn.append("audit", Seq((0L, "created")).toDF("k", "v"))
    } // v1
    TxLog.createBranch(spark, db, "close")
    // a MULTI-TABLE transaction lands as ONE branch version — DbLog
    // never special-cases branches; every accessor already resolves
    // through the scoped log
    TxLog.withBranch(spark, db, "close") {
      DbLog.transact(spark, db, "close-month") { txn =>
        txn.deleteWhereVectored("orders", col("k") <= 2)
        txn.append("audit", Seq((1L, "closed")).toDF("k", "v"))
      }
      assert(DbLog.snapshot(spark, db, "orders").count() == 4)
      assert(DbLog.snapshot(spark, db, "audit").count() == 2)
    }
    // main database: both tables bit-unmoved
    assert(DbLog.snapshot(spark, db, "orders").count() == 6)
    assert(DbLog.snapshot(spark, db, "audit").count() == 1)
    // concurrent main transaction on a THIRD table merges cleanly
    DbLog.transact(spark, db, "meanwhile")(
      _.append("notes", Seq((7L, "n")).toDF("k", "v")))
    val v = TxLog.publishBranch(spark, db, "close")
    assert(DbLog.snapshot(spark, db, "orders").count() == 4)
    assert(DbLog.snapshot(spark, db, "audit").count() == 2)
    assert(DbLog.snapshot(spark, db, "notes").count() == 1)
    // cross-table atomicity survives: the publish is ONE version; the
    // pre-publish cut still reads the old PAIR
    assert(DbLog.snapshot(spark, db, "orders", v - 1).count() == 6)
    assert(DbLog.snapshot(spark, db, "audit", v - 1).count() == 1)
  }

  test("write-audit-publish entirely in SQL: TVF procedures + @branch DML") {
    GraftExtensions.installInto(spark)
    val dir = table((1L to 5L).map(k => (k, s"v$k")))
    def q(s: String) = graft.plans.GraftDml.sql(spark, s)

    val base = spark.sql(s"SELECT * FROM graft_create_branch('$dir', 'wap')")
      .select("version").as[Long].head()
    assert(base == 0L)
    // DML against the branch: the @branch suffix scopes the commit
    q(s"DELETE FROM parquet.`$dir@wap` WHERE k <= 2")
    q(s"INSERT INTO parquet.`$dir@wap` VALUES (9, 'nine')")
    // audit reads: branch TVF sees the changes, main does not
    assert(spark.sql(s"SELECT count(*) c FROM graft_branch('$dir', 'wap')")
      .as[Long].head() == 4)
    assert(spark.sql(s"SELECT count(*) c FROM graft_snapshot('$dir')")
      .as[Long].head() == 5)
    assert(spark.sql(s"SELECT * FROM graft_branches('$dir')")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("wap", 0)))
    // preview says what publish WILL do, touches nothing
    val pv = spark.sql(s"SELECT * FROM graft_publish_preview('$dir', 'wap')")
      .head()
    assert(pv.getLong(2) > 0 && pv.getLong(4) == 0,
      s"expected adds and zero conflicts: $pv") // n_adds, n_conflicts
    assert(TxLog.currentVersion(spark, dir) == 0)
    // audit passed → publish; main flips atomically
    spark.sql(s"SELECT * FROM graft_publish_branch('$dir', 'wap')").collect()
    assert(spark.sql(s"SELECT count(*) c FROM graft_snapshot('$dir')")
      .as[Long].head() == 4)
    assert(TxLog.branches(spark, dir).isEmpty)

    // a literal '@' path that is NOT a branch never splits
    val plain = q(s"DELETE FROM parquet.`$dir` WHERE k = 9")
    assert(plain.select("op").collect().head.getString(0) == "delete")
    // drop procedure abandons an unwanted branch
    spark.sql(s"SELECT * FROM graft_create_branch('$dir', 'junk')").collect()
    spark.sql(s"SELECT * FROM graft_drop_branch('$dir', 'junk')").collect()
    assert(TxLog.branches(spark, dir).isEmpty)
    // diff between TAGS: the audit diff between two named releases
    TxLog.setTag(spark, dir, "before", 0)
    TxLog.setTag(spark, dir, "after", TxLog.currentVersion(spark, dir))
    val byTag = spark.sql(
      s"SELECT * FROM graft_diff('$dir', 'before', 'after')")
    val byVer = TxLog.diff(spark, dir, 0, TxLog.currentVersion(spark, dir))
    assert(byTag.exceptAll(byVer).isEmpty && byVer.exceptAll(byTag).isEmpty)
    assert(spark.sql(s"SELECT * FROM graft_tags('$dir')")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      TxLog.tags(spark, dir).toSet)
  }

  test("@branch ALTER: schema evolves on the branch only; CREATE on a branch refuses") {
    val dir = table(Seq((1L, "a")))
    TxLog.createBranch(spark, dir, "widen")
    def q(s: String) = graft.plans.GraftDml.sql(spark, s)
    val r = q(s"ALTER TABLE parquet.`$dir@widen` ADD COLUMNS (score DOUBLE)")
    assert(r.select("op").head().getString(0) == "add-columns")
    // main pin untouched; branch pin widened
    assert(TxLog.tableSchema(spark, dir).forall(
      !_.fieldNames.contains("score")))
    val br = TxLog.withBranch(spark, dir, "widen")(
      TxLog.snapshot(spark, dir))
    assert(br.columns.contains("score"))
    TxLog.publishBranch(spark, dir, "widen")
    assert(TxLog.snapshot(spark, dir).columns.contains("score"))
    // table-level DDL has no branch meaning
    TxLog.createBranch(spark, dir, "no")
    val e = intercept[IllegalArgumentException] {
      q(s"DROP TABLE parquet.`$dir@no`")
    }
    assert(e.getMessage.contains("ALTER"))
    TxLog.deleteBranch(spark, dir, "no")
  }

  test("concurrent writers on one branch serialize through the same commit claim") {
    val dir = table(Seq((0L, "seed")))
    TxLog.createBranch(spark, dir, "busy")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = TxLog.withBranch(spark, dir, "busy") {
            TxLog.append(spark, dir,
              Seq((i.toLong, s"w$i")).toDF("k", "v"))
          }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    // all four appends landed as distinct branch versions
    val cnt = TxLog.withBranch(spark, dir, "busy") {
      assert(TxLog.currentVersion(spark, dir) == 4)
      TxLog.snapshot(spark, dir).count()
    }
    assert(cnt == 5)
    TxLog.publishBranch(spark, dir, "busy")
    assert(TxLog.snapshot(spark, dir).count() == 5)
  }
}
