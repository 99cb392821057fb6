package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.{DbLog, DeleteWhere, TxLog, UpsertWhere}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ChangeFeedSourceSpec extends SparkSpec {
  import spark.implicits._

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  private var n = 0
  private def uniq(tag: String): String = { n += 1; s"${tag}_$n" }

  test("readStream tails a TxLog table: commits landing mid-query become batches equal to the batch diff") {
    val dir = Files.createTempDirectory("cdc").toString + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .repartition(2).write.parquet(dir)
    TxLog.convert(spark, dir) // v0
    val sink = uniq("cdc_sink")
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir).option("startingVersion", "0").load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // startingVersion=0: the v0 snapshot arrives as inserts
      assert(spark.table(sink).count() == 3)
      // commits land WHILE the query runs; each advance equals the
      // batch diff over the same version range
      UpsertWhere.byKeys(spark, dir, "k",
        Seq((2L, "B2"), (9L, "i")).toDF("k", "v")) // v1
      q.processAllAvailable()
      DeleteWhere.byKeys(spark, dir, "k", Seq(1L)) // v2
      q.processAllAvailable()
      val feed = spark.table(sink)
      val batchDiff01 = TxLog.diff(spark, dir, 0, 1)
      val batchDiff12 = TxLog.diff(spark, dir, 1, 2)
      assert(same(
        feed.filter(col("_commit_version") === 1)
          .drop("_commit_version"),
        batchDiff01))
      assert(same(
        feed.filter(col("_commit_version") === 2)
          .drop("_commit_version"),
        batchDiff12))
      // full-feed net = diff(0, current) (+ the v0 seed inserts)
      assert(feed.count() ==
        3 + batchDiff01.count() + batchDiff12.count())
    } finally q.stop()
  }

  test("default start is NOW: only commits after the query starts are delivered") {
    val dir = Files.createTempDirectory("cdc").toString + "/t"
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    TxLog.convert(spark, dir)
    val sink = uniq("cdc_now")
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir).load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() == 0) // no history replay
      UpsertWhere.byKeys(spark, dir, "k", Seq((2L, "b")).toDF("k", "v"))
      q.processAllAvailable()
      val rows = spark.table(sink)
        .select("k", "v", "_change_type").as[(Long, String, String)]
        .collect().toSet
      assert(rows == Set((2L, "b", "insert")))
    } finally q.stop()
  }

  test("restart from the checkpoint resumes at the cursor, no replay and no gap") {
    val dir = Files.createTempDirectory("cdc").toString + "/t"
    val ck = Files.createTempDirectory("cdc_ck").toString
    val out = Files.createTempDirectory("cdc_out").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    TxLog.convert(spark, dir)
    // a durable sink (memory cannot recover from a checkpoint): the
    // parquet sink's output accumulates across the two runs
    def start() = spark.readStream.format("graft-cdc")
      .option("path", dir).option("startingVersion", "0").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).count() == 1)
    // a commit lands while no query is running
    UpsertWhere.byKeys(spark, dir, "k", Seq((2L, "b")).toDF("k", "v"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // exactly the missed commit arrives once — the checkpoint
      // carried the version cursor: no replay of v0, no gap
      val rows = spark.read.parquet(out)
        .select("k", "_change_type").as[(Long, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(rows == Map((1L, "insert") -> 1, (2L, "insert") -> 1))
    } finally q2.stop()
  }

  test("maxVersionsPerBatch drains a deep backlog as bounded microbatches") {
    val dir = Files.createTempDirectory("cdc").toString + "/t"
    Seq((0L, "seed")).toDF("k", "v").write.parquet(dir)
    TxLog.convert(spark, dir) // v0
    (1 to 6).foreach(i => UpsertWhere.byKeys(spark, dir, "k",
      Seq((i.toLong, s"v$i")).toDF("k", "v"))) // v1..v6 backlog
    val sink = uniq("cdc_rate")
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir).option("startingVersion", "1")
      .option("maxVersionsPerBatch", "2").load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val feed = spark.table(sink)
      // every batch spans ≤ 2 commits: the 6-version backlog needs ≥3
      // microbatches, stamped at their range ends
      val ends = feed.select("_commit_version").distinct()
        .as[Int].collect().sorted.toSeq
      assert(ends == Seq(2, 4, 6), s"expected capped ranges, got $ends")
      // and the DRAINED feed nets to the batch diff over the whole range
      assert(same(feed.drop("_commit_version"), TxLog.diff(spark, dir, 0, 6)))
    } finally q.stop()
  }

  test("DbLog table feeds stream per-table over the shared database cursor") {
    val db = Files.createTempDirectory("cdcdb").toString + "/db"
    DbLog.create(spark, db)
    DbLog.transact(spark, db, "seed") { txn =>
      txn.append("orders", Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amt"))
      txn.append("audit", Seq(("seed")).toDF("op"))
    }
    val v1 = DbLog.currentVersion(spark, db)
    val sink = uniq("cdc_db")
    val q = spark.readStream.format("graft-cdc")
      .option("path", db).option("table", "orders")
      .option("startingVersion", (v1 + 1).toString).load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() == 0)
      // a multi-table transaction: only the subscribed table's rows
      // arrive, stamped with the shared database version
      DbLog.transact(spark, db, "move") { txn =>
        txn.deleteWhere("orders", col("k") === 1L)
        txn.append("audit", Seq(("move")).toDF("op"))
      }
      q.processAllAvailable()
      val rows = spark.table(sink)
        .select("k", "_change_type", "_commit_version")
        .as[(Long, String, Int)].collect().toSet
      assert(rows == Set((1L, "delete", v1 + 1)))
    } finally q.stop()
  }

  test("startingTimestamp replays commits after the wall-clock time") {
    val dir = Files.createTempDirectory("cdc_ts").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(dir)
    TxLog.convert(spark, dir) // v0
    Thread.sleep(1100) // local-fs mtimes are second-granular
    val cut = new java.sql.Timestamp(System.currentTimeMillis()).toString
    Thread.sleep(1100)
    UpsertWhere.byKeys(spark, dir, "k", Seq((3L, "c")).toDF("k", "v")) // v1
    val sink = uniq("cdc_ts_sink")
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir).option("startingTimestamp", cut).load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_ts_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // only v1's insert — v0 predates the cut, so no snapshot replay
      val rows = spark.table(sink)
        .select("k", "_change_type").as[(Long, String)].collect().toSet
      assert(rows == Set((3L, "insert")))
    } finally q.stop()
    // a time before the first commit replays EVERYTHING
    val sink2 = uniq("cdc_ts_sink")
    val q2 = spark.readStream.format("graft-cdc")
      .option("path", dir)
      .option("startingTimestamp", "2000-01-01 00:00:00").load()
      .writeStream.format("memory").queryName(sink2)
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_ts_ck2").toString)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table(sink2).count() == 3)
    } finally q2.stop()
  }

  test("updateImages without keys: a row-tracked table pairs pre/post images by _row_id") {
    import graft.ops.{DeletionVectors, RowTracking}
    val dir = Files.createTempDirectory("cdc_rid").toString + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .repartition(1).sortWithinPartitions("k").write.parquet(dir)
    TxLog.convert(spark, dir)
    RowTracking.enable(spark, dir)
    // untracked tables refuse the option with the fix
    val bare = Files.createTempDirectory("cdc_rid").toString + "/u"
    Seq((1L, "a")).toDF("k", "v").write.parquet(bare)
    TxLog.convert(spark, bare)
    val e = intercept[Exception] {
      spark.readStream.format("graft-cdc").option("path", bare)
        .option("updateImages", "true").load()
        .writeStream.format("memory").queryName(uniq("cdc_rid_bad"))
        .option("checkpointLocation",
          Files.createTempDirectory("cdc_ck").toString)
        .outputMode("append").start()
        .processAllAvailable()
    }
    assert((Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" "))
      .contains("row tracking"))
    val sink = uniq("cdc_rid")
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir).option("updateImages", "true").load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val preIds = RowTracking.read(spark, dir)
        .select("k", RowTracking.Col).as[(Long, Long)].collect().toMap
      DeletionVectors.upsert(spark, dir,
        Seq((2L, "B2"), (9L, "i")).toDF("k", "v"), keyCols = Seq("k"))
      q.processAllAvailable()
      val rows = spark.table(sink)
        .select("k", "v", "_change_type", "_row_id")
        .as[(Long, String, String, Long)].collect().toSet
      // the update pairs by _row_id — both images wear row 2's id
      assert(rows.contains((2L, "b", "update_preimage", preIds(2L))))
      assert(rows.contains((2L, "B2", "update_postimage", preIds(2L))))
      assert(rows.exists(r => r._1 == 9L && r._3 == "insert"))
    } finally q.stop()
  }
}
