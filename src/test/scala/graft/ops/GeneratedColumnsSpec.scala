package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generated columns ([[GeneratedColumns]]): fill-on-insert,
  * validate-on-explicit-insert, recompute-on-update (MOR upsert and
  * SQL MERGE images), generated PARTITION columns, SQL CREATE +
  * INSERT surface, schema-change guards, DROP cascade.
  */
class GeneratedColumnsSpec extends SparkSpec {

  private def ddl(stmt: String) = graft.plans.GraftDml.sql(spark, stmt)

  private def fresh(): String = {
    val dir = Files.createTempDirectory("gencol").toString + "/t"
    ddl(s"""CREATE TABLE parquet.`$dir`
           |  (qty DOUBLE, price DOUBLE,
           |   total DOUBLE GENERATED ALWAYS AS (qty * price))""".stripMargin)
    dir
  }

  test("insert omitting the column computes it; explicit wrong value refuses") {
    import spark.implicits._
    val dir = fresh()
    TxLog.append(spark, dir, Seq((2.0, 3.0), (4.0, 5.0)).toDF("qty", "price"))
    val got = TxLog.snapshot(spark, dir).orderBy("qty").collect()
    assert(got.map(_.getDouble(2)).toSeq == Seq(6.0, 20.0))
    // explicit CORRECT value passes (validated, not recomputed)
    TxLog.append(spark, dir,
      Seq((10.0, 10.0, 100.0)).toDF("qty", "price", "total"))
    // explicit WRONG value refuses
    intercept[GeneratedColumns.GeneratedColumnViolation] {
      TxLog.append(spark, dir,
        Seq((1.0, 1.0, 999.0)).toDF("qty", "price", "total"))
    }
    assert(TxLog.snapshot(spark, dir).count() == 3L)
  }

  test("MOR upsert recomputes: a changed source moves the derived value") {
    import spark.implicits._
    val dir = fresh()
    TxLog.append(spark, dir, Seq((2.0, 3.0)).toDF("qty", "price"))
    // the batch supplies a STALE total — the update-shaped write
    // recomputes it from the new price
    DeletionVectors.upsert(spark, dir,
      Seq((2.0, 50.0, 6.0)).toDF("qty", "price", "total"),
      keyCols = Seq("qty"))
    assert(TxLog.snapshot(spark, dir).head().getDouble(2) == 100.0)
    // and a batch omitting it entirely also lands computed
    DeletionVectors.upsert(spark, dir,
      Seq((7.0, 2.0)).toDF("qty", "price"), keyCols = Seq("qty"))
    assert(TxLog.snapshot(spark, dir).filter(col("qty") === 7.0)
      .head().getDouble(2) == 14.0)
  }

  test("SQL surface: INSERT omits generated columns; MERGE images recompute") {
    import spark.implicits._
    val dir = fresh()
    ddl(s"INSERT INTO parquet.`$dir` SELECT 3.0, 4.0")
    assert(TxLog.snapshot(spark, dir).head().getDouble(2) == 12.0)
    Seq((3.0, 9.0)).toDF("k", "p").createOrReplaceTempView("gencol_src")
    ddl(s"""MERGE INTO parquet.`$dir` t USING gencol_src s
      ON t.qty = s.k
      WHEN MATCHED THEN UPDATE SET price = s.p""")
    val r = TxLog.snapshot(spark, dir).head()
    assert(r.getDouble(1) == 9.0 && r.getDouble(2) == 27.0) // recomputed
  }

  test("generated PARTITION column: layout derived, never caller-supplied") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gencol").toString + "/t"
    ddl(s"""CREATE TABLE parquet.`$dir`
           |  (ts TIMESTAMP, v BIGINT,
           |   event_date DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
           |PARTITIONED BY (event_date)""".stripMargin)
    TxLog.append(spark, dir, Seq(
      ("2024-03-01 10:00:00", 1L), ("2024-03-02 11:00:00", 2L),
      ("2024-03-01 23:59:59", 3L)).toDF("ts0", "v")
      .select(to_timestamp(col("ts0")).as("ts"), col("v")))
    // the layout is a hive tree over the DERIVED value
    val files = TxLog.liveFiles(spark, dir)
    assert(files.forall(_.startsWith("event_date=")), files)
    assert(files.map(_.split('/').head).toSet ==
      Set("event_date=2024-03-01", "event_date=2024-03-02"))
    val got = TxLog.snapshot(spark, dir)
    assert(got.count() == 3L)
    assert(got.filter(col("event_date") === "2024-03-01").count() == 2L)
  }

  test("streaming append sink fills generated columns") {
    import spark.implicits._
    val dir = fresh()
    val sink = graft.streaming.TxLogIngest.appendSink(dir)
    sink(Seq((5.0, 2.0)).toDF("qty", "price"), 0L)
    assert(TxLog.snapshot(spark, dir).head().getDouble(2) == 10.0)
  }

  test("schema-change guards: sources pinned, DROP of the column cascades") {
    import spark.implicits._
    val dir = fresh()
    TxLog.append(spark, dir, Seq((2.0, 3.0)).toDF("qty", "price"))
    // a referenced source refuses rename / drop / widen
    intercept[IllegalArgumentException] {
      ColumnMapping.renameColumn(spark, dir, "price", "p2")
    }
    intercept[IllegalArgumentException] {
      ddl(s"ALTER TABLE parquet.`$dir` DROP COLUMN qty")
    }
    // the generated column itself refuses rename
    intercept[IllegalArgumentException] {
      ColumnMapping.renameColumn(spark, dir, "total", "t2")
    }
    // DROP of the generated column cascades the declaration: the next
    // insert does NOT resurrect it
    ddl(s"ALTER TABLE parquet.`$dir` DROP COLUMN total")
    assert(GeneratedColumns.spec(spark, dir).isEmpty)
    TxLog.append(spark, dir, Seq((9.0, 9.0)).toDF("qty", "price"))
    assert(TxLog.snapshot(spark, dir).columns.toSeq == Seq("qty", "price"))
  }

  test("declaration validation: chains and no-reference exprs refuse") {
    val dir = fresh()
    intercept[IllegalArgumentException] { // references a generated column
      GeneratedColumns.declare(spark, dir,
        Seq("total" -> "qty * price", "t2" -> "total + 1"))
    }
    intercept[IllegalArgumentException] { // references nothing
      GeneratedColumns.declare(spark, dir, Seq("c" -> "1 + 1"))
    }
  }
}
