package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.{DbLog, TxLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DbIngestSpec extends SparkSpec {

  private lazy val events = graft.Tables.events(spark, sf("events"))

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  private def slice(e: Long) =
    events.filter(pmod(col("event_id"), lit(3)) === e)

  test("each epoch fans out to per-type tables in ONE commit; replay is a no-op") {
    val db = Files.createTempDirectory("dbi").toString + "/db"
    val sink = DbIngest.routeSink(db, "event_type")
    sink(slice(0), 0)
    sink(slice(1), 1)
    sink(slice(1), 1) // re-delivered epoch: the single txn probe skips it
    sink(slice(2), 2)
    // v0 create + exactly one version per epoch, regardless of table count
    assert(DbLog.currentVersion(spark, db) == 3)
    assert(DbLog.tables(spark, db).toSet ==
      Set("click", "error", "purchase", "signup", "view"))
    // every routed table holds exactly its type's rows, once
    DbLog.tables(spark, db).foreach { tbl =>
      assert(same(DbLog.snapshot(spark, db, tbl),
        events.filter(col("event_type") === tbl).drop("event_type")),
        s"table $tbl diverged")
    }
    // cross-table epoch atomicity under time travel: at v1, every
    // table is exactly epoch 0's slice of its type
    DbLog.tables(spark, db, 1).foreach { tbl =>
      assert(same(DbLog.snapshot(spark, db, tbl, 1),
        slice(0).filter(col("event_type") === tbl).drop("event_type")))
    }
  }

  test("NULL or illegal discriminator values fail the epoch loudly") {
    val db = Files.createTempDirectory("dbi_bad").toString + "/db"
    val sink = DbIngest.routeSink(db, "event_type")
    intercept[IllegalArgumentException] {
      sink(events.limit(10).withColumn("event_type",
        lit(null).cast("string")), 0)
    }
    intercept[IllegalArgumentException] {
      sink(events.limit(10).withColumn("event_type", lit("no-dash!")), 1)
    }
    // nothing committed by either poisoned epoch
    assert(DbLog.currentVersion(spark, db) == 0)
    assert(DbLog.tables(spark, db).isEmpty)
  }

  test("compactEvery packs each table's tail in place; relations unchanged") {
    val db = Files.createTempDirectory("dbi_c").toString + "/db"
    val sink = DbIngest.routeSink(db, "event_type", compactEvery = 3)
    (0 until 3).foreach(e => sink(slice(e.toLong).repartition(4), e.toLong))
    // 3 epochs × 4 files × 5 tables packed down to ~1 file per table
    val live = TxLog.liveFiles(spark, db)
    assert(live.size <= 10, s"expected a packed tail, got ${live.size} files")
    // prefix-confined: every file still lives under its table
    assert(live.forall(_.contains('/')))
    DbLog.tables(spark, db).foreach { tbl =>
      assert(same(DbLog.snapshot(spark, db, tbl),
        events.filter(col("event_type") === tbl).drop("event_type")))
    }
    // a replayed epoch after the pack + checkpoint is still recognized
    sink(slice(1).repartition(4), 1)
    assert(same(DbLog.snapshot(spark, db, "click"),
      events.filter(col("event_type") === "click").drop("event_type")))
  }
}
