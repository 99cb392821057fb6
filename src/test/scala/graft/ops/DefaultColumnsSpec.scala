package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DEFAULT column values ([[DefaultColumns]]): fill when omitted,
  * supplied value wins, constants only, SQL CREATE + INSERT surface,
  * rename follow-through, drop cascade, composition with identity and
  * generated columns on one table.
  */
class DefaultColumnsSpec extends SparkSpec {

  private def ddl(stmt: String) = graft.plans.GraftDml.sql(spark, stmt)

  test("omitted column lands the default; supplied value wins") {
    import spark.implicits._
    val dir = Files.createTempDirectory("defcol").toString + "/t"
    ddl(s"""CREATE TABLE parquet.`$dir`
           |  (k BIGINT, status STRING DEFAULT 'new',
           |   score DOUBLE DEFAULT 0.0)""".stripMargin)
    TxLog.append(spark, dir, Seq(1L).toDF("k")) // omit both
    TxLog.append(spark, dir,
      Seq((2L, "done", 9.5)).toDF("k", "status", "score")) // supply both
    val got = TxLog.snapshot(spark, dir).orderBy("k").collect()
    assert(got(0).getString(1) == "new" && got(0).getDouble(2) == 0.0)
    assert(got(1).getString(1) == "done" && got(1).getDouble(2) == 9.5)
  }

  test("SQL INSERT omitting defaulted columns; full-width insert wins") {
    val dir = Files.createTempDirectory("defcol").toString + "/t"
    ddl(s"CREATE TABLE parquet.`$dir` (k BIGINT, status STRING DEFAULT 'new')")
    ddl(s"INSERT INTO parquet.`$dir` SELECT 1L")
    ddl(s"INSERT INTO parquet.`$dir` SELECT 2L, 'old'")
    val got = TxLog.snapshot(spark, dir).orderBy("k").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("new", "old"))
  }

  test("constants only; no combining with GENERATED/IDENTITY") {
    val dir = Files.createTempDirectory("defcol").toString + "/t"
    ddl(s"CREATE TABLE parquet.`$dir` (k BIGINT, v DOUBLE)")
    intercept[IllegalArgumentException] {
      DefaultColumns.declare(spark, dir, Seq("v" -> "k * 2")) // references
    }
    val d2 = Files.createTempDirectory("defcol").toString + "/t"
    intercept[IllegalArgumentException] {
      ddl(s"CREATE TABLE parquet.`$d2` (id BIGINT GENERATED ALWAYS AS " +
        "IDENTITY DEFAULT 5, v STRING)")
    }
  }

  test("rename follows the declaration; drop cascades it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("defcol").toString + "/t"
    ddl(s"CREATE TABLE parquet.`$dir` (k BIGINT, status STRING DEFAULT 'new')")
    ColumnMapping.renameColumn(spark, dir, "status", "state")
    TxLog.append(spark, dir, Seq(1L).toDF("k"))
    assert(TxLog.snapshot(spark, dir).head().getString(1) == "new")
    assert(DefaultColumns.spec(spark, dir) == Seq("state" -> "'new'"))
    ddl(s"ALTER TABLE parquet.`$dir` DROP COLUMN state")
    assert(DefaultColumns.spec(spark, dir).isEmpty)
  }

  test("identity + default + generated compose on one table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("defcol").toString + "/t"
    ddl(s"""CREATE TABLE parquet.`$dir`
           |  (id BIGINT GENERATED ALWAYS AS IDENTITY,
           |   qty DOUBLE, rate DOUBLE DEFAULT 1.25,
           |   cost DOUBLE GENERATED ALWAYS AS (qty * rate))""".stripMargin)
    // the insert supplies ONLY qty: identity assigns, default fills
    // rate, the generated column computes from the filled default
    ddl(s"INSERT INTO parquet.`$dir` SELECT 4.0")
    val r = TxLog.snapshot(spark, dir).head()
    assert(r.getLong(0) == 1L)
    assert(r.getDouble(2) == 1.25 && r.getDouble(3) == 5.0)
    // streaming sink: same composition
    val sink = graft.streaming.TxLogIngest.appendSink(dir)
    sink(Seq(8.0).toDF("qty"), 0L)
    val s2 = TxLog.snapshot(spark, dir).orderBy("id").collect()(1)
    assert(s2.getLong(0) == 2L && s2.getDouble(3) == 10.0)
  }
}
