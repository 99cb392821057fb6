package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.TxLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `ALTER TABLE … ALTER COLUMN c TYPE t` ([[GraftDdl]]): metadata-only
  * type widening — old footers serve under the wide pin natively (both
  * parquet readers), narrowing/lossy casts refuse, mixed-era tables
  * (pre-widen int files + post-widen long files) read as one relation,
  * time travel keeps each version's own type, stats pruning and keyed
  * DML survive the widen, composition with column mapping (rename then
  * widen) holds.
  */
class TypeWidenSpec extends SparkSpec {

  private def ddl(stmt: String) = GraftDml.sql(spark, stmt)

  private def fresh(rows: Int = 100): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("widen").toString + "/t"
    (0 until rows).map(i => (i, i.toFloat / 2, BigDecimal(i).bigDecimal))
      .toDF("k", "x", "d")
      .select(col("k"), col("x"), col("d").cast(DecimalType(10, 2)).as("d"))
      .repartition(4).write.parquet(dir)
    TxLog.convert(spark, dir)
    dir
  }

  test("widen int->long, float->double, decimal growth; no file rewritten") {
    val dir = fresh()
    val filesBefore = TxLog.liveFiles(spark, dir).toSet
    ddl(s"ALTER TABLE parquet.`$dir` ALTER COLUMN k TYPE BIGINT")
    ddl(s"ALTER TABLE parquet.`$dir` ALTER COLUMN x TYPE DOUBLE")
    ddl(s"ALTER TABLE parquet.`$dir` ALTER COLUMN d TYPE DECIMAL(20,2)")
    assert(TxLog.liveFiles(spark, dir).toSet == filesBefore)
    val got = TxLog.snapshot(spark, dir)
    assert(got.schema("k").dataType == LongType)
    assert(got.schema("x").dataType == DoubleType)
    assert(got.schema("d").dataType == DecimalType(20, 2))
    assert(got.count() == 100L)
    assert(got.agg(sum("k")).head().getLong(0) == 4950L)
  }

  test("mixed-era reads: pre-widen int files + post-widen long appends") {
    import spark.implicits._
    val dir = fresh()
    ddl(s"ALTER TABLE parquet.`$dir` ALTER COLUMN k TYPE BIGINT")
    TxLog.append(spark, dir,
      Seq((5000000000L, 1.0f, BigDecimal(1).bigDecimal)).toDF("k", "x", "d")
        .select(col("k"), col("x"),
          col("d").cast(DecimalType(10, 2)).as("d")))
    val got = TxLog.snapshot(spark, dir)
    assert(got.count() == 101L)
    // a value only BIGINT can hold reads back next to int-era rows
    assert(got.agg(max("k")).head().getLong(0) == 5000000000L)
    // time travel below the widen keeps the INT type
    assert(TxLog.snapshot(spark, dir, 0).schema("k").dataType == IntegerType)
  }

  test("narrowing and lossy casts refuse with the allowlist") {
    val dir = fresh()
    for (bad <- Seq("ALTER COLUMN k TYPE INT", // same = not a widen
      "ALTER COLUMN k TYPE SMALLINT", // narrow
      "ALTER COLUMN x TYPE INT", // lossy
      "ALTER COLUMN d TYPE DECIMAL(8,2)", // precision shrink
      "ALTER COLUMN d TYPE DECIMAL(10,4)")) { // integer digits shrink
      intercept[IllegalArgumentException] {
        ddl(s"ALTER TABLE parquet.`$dir` $bad")
      }
    }
    intercept[IllegalArgumentException] { // SET NOT NULL is a lie on disk
      ddl(s"ALTER TABLE parquet.`$dir` ALTER COLUMN k SET NOT NULL")
    }
  }

  test("keyed DML and stats pruning keep working after the widen") {
    import spark.implicits._
    val dir = fresh(1000)
    TxLog.setStatsColumns(spark, dir, Seq("k"))
    graft.ops.Compact.binPack(spark, dir, targetBytes = 4096,
      smallBytes = 1L << 30, sortCols = Seq("k"))
    ddl(s"ALTER TABLE parquet.`$dir` ALTER COLUMN k TYPE BIGINT")
    // log-carried stats (doubles, type-agnostic) still prune
    val all = TxLog.liveFiles(spark, dir).size
    assert(TxLog.candidateFilesFromLog(spark, dir, "k", 0, 10).size < all)
    assert(TxLog.snapshotPruned(spark, dir, "k", 0, 10).count() == 11)
    // a MOR upsert with the WIDE type lands
    graft.ops.DeletionVectors.upsert(spark, dir,
      Seq((5L, 9.5f, BigDecimal(9).bigDecimal)).toDF("k", "x", "d")
        .select(col("k"), col("x"),
          col("d").cast(DecimalType(10, 2)).as("d")),
      keyCols = Seq("k"))
    assert(TxLog.snapshot(spark, dir).filter(col("k") === 5L)
      .head().getFloat(1) == 9.5f)
  }

  test("rename then widen: column mapping and widening compose") {
    val dir = fresh()
    ddl(s"ALTER TABLE parquet.`$dir` RENAME COLUMN k TO row_key")
    ddl(s"ALTER TABLE parquet.`$dir` ALTER COLUMN row_key TYPE BIGINT")
    val got = TxLog.snapshot(spark, dir)
    assert(got.schema("row_key").dataType == LongType)
    assert(got.agg(sum("row_key")).head().getLong(0) == 4950L)
    // physical name survives both: files still spell int-typed `k`
    TxLog.liveFiles(spark, dir).foreach { n =>
      val sc = spark.read.parquet(s"$dir/$n").schema
      assert(sc.fieldNames.contains("k") && sc("k").dataType == IntegerType)
    }
  }

  test("graft_schema surfaces physical names, widen, identity, generation") {
    graft.GraftExtensions.installInto(spark)
    val dir = Files.createTempDirectory("widen").toString + "/t"
    ddl(s"""CREATE TABLE parquet.`$dir`
           |  (id BIGINT GENERATED ALWAYS AS IDENTITY,
           |   k INT, price DOUBLE,
           |   twice DOUBLE GENERATED ALWAYS AS (price * 2))""".stripMargin)
    ddl(s"ALTER TABLE parquet.`$dir` RENAME COLUMN k TO row_key")
    ddl(s"ALTER TABLE parquet.`$dir` ALTER COLUMN row_key TYPE BIGINT")
    val rows = spark.sql(s"SELECT * FROM graft_schema('$dir')")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(3), r.getString(4), r.getString(5)))
      .toMap
    assert(rows("row_key")._1 == "bigint") // widened type
    assert(rows("row_key")._2 == "k") // physical name survives both
    assert(rows("twice")._3 == "price * 2") // generation expr
    assert(rows("id")._4 == "START 1 STEP 1") // identity declaration
    // time travel: version 0's schema shows the pre-rename name
    val v0 = spark.sql(s"SELECT column FROM graft_schema('$dir', 0)")
      .collect().map(_.getString(0)).toSet
    assert(v0.contains("k") && !v0.contains("row_key"))
  }

  test("date -> timestamp_ntz widens") {
    import spark.implicits._
    val dir = Files.createTempDirectory("widen").toString + "/t"
    Seq(java.sql.Date.valueOf("2024-03-01")).toDF("dt").write.parquet(dir)
    TxLog.convert(spark, dir)
    ddl(s"ALTER TABLE parquet.`$dir` ALTER COLUMN dt TYPE TIMESTAMP_NTZ")
    val got = TxLog.snapshot(spark, dir)
    assert(got.schema("dt").dataType == TimestampNTZType)
    assert(got.head().getAs[java.time.LocalDateTime](0) ==
      java.time.LocalDateTime.of(2024, 3, 1, 0, 0))
  }
}
