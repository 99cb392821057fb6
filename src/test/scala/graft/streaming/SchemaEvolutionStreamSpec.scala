package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.{ColumnMapping, TxLog, UpsertWhere}
import org.apache.spark.sql.functions._

/** MID-STREAM SCHEMA EVOLUTION: a running graft-cdc → apply pipeline
  * survives ALTER TABLE ADD COLUMN (and a mapped RENAME) on the source
  * BETWEEN microbatches — the Delta-source contract: the frozen-schema
  * stream FAILS the evolution batch with the fix named (never silently
  * dropping the new column's values), the failed range stays
  * uncommitted, and a restart from the same checkpoint redelivers it
  * under the new schema; the apply sink widens the replica in the same
  * application. Recovery batches (ranges before the restart) read
  * under the restarted stream's pin, so old rows align as NULLs.
  */
class SchemaEvolutionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("ADD COLUMN under a running cdc→apply pipeline: fail-with-fix, restart, replica widens with non-null values") {
    val src = Files.createTempDirectory("sevo").toString + "/src"
    val rep = Files.createTempDirectory("sevo").toString + "/rep"
    val ck = Files.createTempDirectory("sevo_ck").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(src)
    TxLog.convert(spark, src)
    def start() = spark.readStream.format("graft-cdc")
      .option("path", src).option("startingVersion", "0").load()
      .writeStream.format("graft").option("path", rep)
      .option("mode", "apply").option("keys", "k")
      .option("checkpointLocation", ck).start()
    val q1 = start()
    q1.processAllAvailable()
    UpsertWhere.byKeys(spark, src, "k",
      Seq((2L, "b2"), (3L, "c")).toDF("k", "v")) // pre-evolution commit
    q1.processAllAvailable()
    assert(TxLog.snapshot(spark, rep).count() == 3L)
    // the source evolves UNDER the running stream
    graft.plans.GraftDml.sql(spark,
      s"ALTER TABLE parquet.`$src` ADD COLUMNS (w BIGINT)")
    TxLog.append(spark, src,
      Seq((10L, "n1", 100L), (11L, "n2", 110L)).toDF("k", "v", "w"))
    // the frozen-schema stream must FAIL this batch (silent projection
    // would drop every w value), naming the restart fix
    val err = intercept[Exception] { q1.processAllAvailable() }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(err).contains("restart the query"),
      s"wrong failure: ${rootMsg(err)}")
    q1.stop()
    // restart from the SAME checkpoint: the uncommitted range
    // redelivers under the new schema — no loss, no duplicate
    val q2 = start()
    q2.processAllAvailable()
    // a post-restart commit flows normally, w populated
    UpsertWhere.byKeys(spark, src, "k",
      Seq((1L, "a9", 900L)).toDF("k", "v", "w"))
    q2.processAllAvailable()
    q2.stop()
    val got = TxLog.snapshot(spark, rep)
    assert(got.columns.contains("w"))
    // post-evolution rows landed with NON-NULL w in the replica
    assert(got.filter(col("k") >= 10L && col("w").isNotNull).count() == 2L)
    assert(got.filter(col("k") === 1L).head().getAs[Long]("w") == 900L)
    // pre-evolution rows read NULL under the widened pin
    assert(got.filter(col("k").isin(2L, 3L) && col("w").isNull).count() == 2L)
    // replica state == source state, exactly once each
    val srcNow = TxLog.snapshot(spark, src)
      .select("k", "v", "w").as[(Long, String, Option[Long])].collect().toSet
    val repNow = got
      .select("k", "v", "w").as[(Long, String, Option[Long])].collect().toSet
    assert(repNow == srcNow && got.count() == srcNow.size)
  }

  test("auto-restart: ADD COLUMN and a mapped RENAME heal with ZERO manual intervention") {
    val src = Files.createTempDirectory("sevo").toString + "/src"
    val rep = Files.createTempDirectory("sevo").toString + "/rep"
    val ck = Files.createTempDirectory("sevo_ck").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(src)
    TxLog.convert(spark, src)
    val sup = new CdcSupervisor(() =>
      spark.readStream.format("graft-cdc")
        .option("path", src).option("startingVersion", "0").load()
        .writeStream.format("graft").option("path", rep)
        .option("mode", "apply").option("keys", "k")
        .option("checkpointLocation", ck).start())
    sup.processAllAvailable()
    assert(sup.restarts == 0)
    // evolution #1: ADD COLUMN + a commit carrying it — ONE drain
    // call must fail internally, restart, and redeliver
    graft.plans.GraftDml.sql(spark,
      s"ALTER TABLE parquet.`$src` ADD COLUMNS (w BIGINT)")
    TxLog.append(spark, src,
      Seq((10L, "n1", 100L), (11L, "n2", 110L)).toDF("k", "v", "w"))
    sup.processAllAvailable()
    assert(sup.restarts == 1)
    // evolution #2 in the same supervised lifetime: another widen +
    // a keyed update flowing through the healed stream
    graft.plans.GraftDml.sql(spark,
      s"ALTER TABLE parquet.`$src` ADD COLUMNS (z DOUBLE)")
    UpsertWhere.byKeys(spark, src, "k",
      Seq((1L, "a9", 900L, 1.5)).toDF("k", "v", "w", "z"))
    sup.processAllAvailable()
    assert(sup.restarts == 2)
    sup.stop()
    // replica ≡ source under the final schema, exactly once each
    val got = TxLog.snapshot(spark, rep)
    assert(got.columns.sorted.toSeq == Seq("k", "v", "w", "z"))
    val srcNow = TxLog.snapshot(spark, src)
      .select("k", "v", "w").as[(Long, String, Option[Long])]
      .collect().toSet
    val repNow = got.select("k", "v", "w")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(repNow == srcNow && got.count() == srcNow.size)
    assert(got.filter(col("k") === 1L).head().getAs[Long]("w") == 900L)
    assert(got.filter(col("k") === 1L).head().getAs[Double]("z") == 1.5)
    // a genuine (non-evolution) failure must RETHROW, not hot-loop:
    // the detector is type-keyed, not message-keyed
    assert(!CdcSupervisor.isEvolutionFailure(
      new IllegalStateException("restart the query — impostor message")))
    assert(CdcSupervisor.isEvolutionFailure(new RuntimeException(
      new org.apache.spark.sql.graft.SchemaEvolvedException("x"))))
  }

  test("auto-restart: ADD COLUMN on a DATABASE table heals a KEYLESS (_row_id) feed") {
    import graft.ops.{DbLog, RowTracking}
    import org.apache.spark.sql.types.{LongType, StructField}
    val root = Files.createTempDirectory("sevo_db").toString
    val db = s"$root/db"
    val rep = s"$root/rep"
    DbLog.create(spark, db)
    DbLog.transact(spark, db, "seed")(_.append("t",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")))
    RowTracking.enableTable(spark, db, "t")
    // keyless per-table feed (no business keys — images pair by the
    // stable _row_id, which is also the apply sink's merge key)
    val sup = new CdcSupervisor(() =>
      spark.readStream.format("graft-cdc")
        .option("path", db).option("table", "t")
        .option("updateImages", "true")
        .option("startingVersion", "0").load()
        .writeStream.format("graft").option("path", rep)
        .option("mode", "apply").option("keys", RowTracking.Col)
        .option("checkpointLocation", s"$root/ck").start())
    sup.processAllAvailable()
    assert(sup.restarts == 0)
    // per-table ADD COLUMN mid-stream + a commit carrying it: ONE
    // drain must fail internally, restart, redeliver under the pin
    DbLog.addColumn(spark, db, "t", StructField("w", LongType))
    DbLog.transact(spark, db, "post-add")(_.append("t",
      Seq((10L, "n", 100L)).toDF("k", "v", "w")))
    sup.processAllAvailable()
    assert(sup.restarts == 1)
    // a MOR update through the healed stream still pairs by _row_id
    val upd = DbLog.snapshot(spark, db, "t").filter(col("k") === 1L)
      .withColumn("w", lit(7L)).localCheckpoint()
    DbLog.transact(spark, db, "upd")(_.upsertKeyed("t", Seq("k"), upd))
    sup.processAllAvailable()
    sup.stop()
    // replica ≡ tracked source rows — same ids, same values, once each
    val srcNow = RowTracking.readTable(spark, db, "t")
      .drop(RowTracking.VerCol)
    val got = TxLog.snapshot(spark, rep)
      .select(srcNow.columns.map(col): _*)
    assert(got.exceptAll(srcNow).isEmpty && srcNow.exceptAll(got).isEmpty,
      "replica != source after keyless evolution healing")
    assert(TxLog.snapshot(spark, rep).filter(col("k") === 1L)
      .head().getAs[Long]("w") == 7L)
  }

  test("auto-restart: TYPE WIDENING mid-stream heals; old and new rows read wide in the replica") {
    val src = Files.createTempDirectory("sevo").toString + "/src"
    val rep = Files.createTempDirectory("sevo").toString + "/rep"
    val ck = Files.createTempDirectory("sevo_ck").toString
    Seq((1L, 10), (2L, 20)).toDF("k", "q").write.parquet(src)
    TxLog.convert(spark, src)
    val sup = new CdcSupervisor(() =>
      spark.readStream.format("graft-cdc")
        .option("path", src).option("startingVersion", "0").load()
        .writeStream.format("graft").option("path", rep)
        .option("mode", "apply").option("keys", "k")
        .option("checkpointLocation", ck).start())
    sup.processAllAvailable()
    assert(sup.restarts == 0)
    // the column widens INT -> BIGINT under the running stream, and a
    // commit lands values past INT range: serving them under the
    // frozen INT schema would corrupt — the batch must fail typed,
    // the supervisor restart, the redelivery read wide
    graft.plans.GraftDml.sql(spark,
      s"ALTER TABLE parquet.`$src` ALTER COLUMN q TYPE BIGINT")
    TxLog.append(spark, src,
      Seq((3L, 5000000000L)).toDF("k", "q"))
    sup.processAllAvailable()
    assert(sup.restarts == 1)
    sup.stop()
    val got = TxLog.snapshot(spark, rep)
    assert(got.schema("q").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.filter(col("k") === 3L).head().getAs[Long]("q") ==
      5000000000L)
    // pre-evolution rows read wide natively, values intact
    assert(got.filter(col("k") === 1L).head().getAs[Long]("q") == 10L)
    assert(got.count() == 3L)
  }

  test("auto-restart: widen then DROP COLUMN through ONE supervisor — every legal pin change heals") {
    val src = Files.createTempDirectory("sevo").toString + "/src"
    val rep = Files.createTempDirectory("sevo").toString + "/rep"
    val ck = Files.createTempDirectory("sevo_ck").toString
    Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "q", "v").write.parquet(src)
    TxLog.convert(spark, src)
    val sup = new CdcSupervisor(() =>
      spark.readStream.format("graft-cdc")
        .option("path", src).option("startingVersion", "0").load()
        .writeStream.format("graft").option("path", rep)
        .option("mode", "apply").option("keys", "k")
        .option("followDrops", "true") // opt-in: replica follows drops
        .option("checkpointLocation", ck).start())
    sup.processAllAvailable()
    // evolution #1: widen
    graft.plans.GraftDml.sql(spark,
      s"ALTER TABLE parquet.`$src` ALTER COLUMN q TYPE BIGINT")
    TxLog.append(spark, src, Seq((3L, 6000000000L, "c")).toDF("k", "q", "v"))
    sup.processAllAvailable()
    assert(sup.restarts == 1)
    // evolution #2 in the same supervised lifetime: DROP COLUMN — the
    // feed loses v, the replica must follow (the apply sink drops it)
    ColumnMapping.dropColumn(spark, src, "v")
    TxLog.append(spark, src, Seq((4L, 40L)).toDF("k", "q"))
    sup.processAllAvailable()
    assert(sup.restarts == 2)
    sup.stop()
    val got = TxLog.snapshot(spark, rep)
    assert(!got.columns.contains("v"), "replica must follow the drop")
    assert(got.schema("q").dataType ==
      org.apache.spark.sql.types.LongType)
    import spark.implicits._
    assert(got.select("k", "q").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 6000000000L), (4L, 40L)))
  }

  test("auto-restart: a mapped RENAME heals hands-off; the redelivered range lands under the new name") {
    val src = Files.createTempDirectory("sevo").toString + "/src"
    val ck = Files.createTempDirectory("sevo_ck").toString
    val out = Files.createTempDirectory("sevo_out").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amount").write.parquet(src)
    TxLog.convert(spark, src)
    val sup = new CdcSupervisor(() =>
      spark.readStream.format("graft-cdc")
        .option("path", src).option("startingVersion", "0").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).outputMode("append").start())
    sup.processAllAvailable()
    ColumnMapping.renameColumn(spark, src, "amount", "price")
    UpsertWhere.byKeys(spark, src, "k", Seq((3L, 30.0)).toDF("k", "price"))
    sup.processAllAvailable() // heals internally — no intercept, no stop
    assert(sup.restarts == 1)
    sup.stop()
    val feed = spark.read.option("mergeSchema", "true").parquet(out)
    assert(feed.columns.contains("price"))
    assert(feed.filter(col("price").isNotNull)
      .select("k", "price").as[(Long, Double)].collect().toSet ==
      Set((3L, 30.0)))
    assert(feed.filter(col("_change_type") === "insert").count() == 3L)
  }

  test("mapped RENAME under a running stream: fail-with-fix; restart feeds the new name, recovery ranges included") {
    val src = Files.createTempDirectory("sevo").toString + "/src"
    val ck = Files.createTempDirectory("sevo_ck").toString
    val out = Files.createTempDirectory("sevo_out").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amount").write.parquet(src)
    TxLog.convert(spark, src)
    def start() = spark.readStream.format("graft-cdc")
      .option("path", src).option("startingVersion", "0").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable()
    ColumnMapping.renameColumn(spark, src, "amount", "price")
    UpsertWhere.byKeys(spark, src, "k", Seq((3L, 30.0)).toDF("k", "price"))
    val err = intercept[Exception] { q1.processAllAvailable() }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(err).contains("restart the query"))
    q1.stop()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // the restarted query REDELIVERS the failed range under the NEW
    // logical name, exactly once: pre-rename batches sit in the sink
    // under the old spelling (already shipped — a sink cannot be
    // respelled retroactively), the redelivered commit arrives as
    // `price` with its value intact (resolved through the unchanged
    // physical name), and nothing is lost or duplicated
    val feed = spark.read.option("mergeSchema", "true").parquet(out)
    assert(feed.columns.contains("price"))
    assert(feed.filter(col("price").isNotNull)
      .select("k", "price").as[(Long, Double)].collect().toSet ==
      Set((3L, 30.0)))
    assert(feed.filter(col("_change_type") === "insert").count() == 3L)
  }
}
