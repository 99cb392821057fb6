package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Identity columns ([[IdentityColumns]]): GENERATED ALWAYS
  * assignment on every append surface, kernel-atomic range
  * allocation (disjoint under races), start/step arithmetic, gap-on-
  * failure semantics, explicit-insert refusal, SQL CREATE + INSERT,
  * ledger pruning under vacuum.
  */
class IdentityColumnsSpec extends SparkSpec {

  private def fresh(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("ident").toString + "/t"
    graft.plans.GraftDml.sql(spark,
      s"""CREATE TABLE parquet.`$dir`
         |  (id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""".stripMargin)
    dir
  }

  test("appends fill unique monotone ids; high water survives commits") {
    import spark.implicits._
    val dir = fresh()
    TxLog.append(spark, dir, (0 until 50).map(i => s"a$i").toDF("v"))
    TxLog.append(spark, dir, (0 until 30).map(i => s"b$i").toDF("v"))
    val got = TxLog.snapshot(spark, dir)
    assert(got.count() == 80L)
    assert(got.select("id").distinct().count() == 80L) // unique
    assert(got.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(1L, 80L)) // dense here: single writer
    // second batch sits strictly above the first
    assert(got.filter(col("v").startsWith("b"))
      .agg(min("id")).head().getLong(0) == 51L)
    assert(IdentityColumns.highWater(spark, dir) == 80L)
  }

  test("start/step arithmetic; multi-partition batches stay unique") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ident").toString + "/t"
    graft.plans.GraftDml.sql(spark,
      s"""CREATE TABLE parquet.`$dir`
         |  (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 5),
         |   v BIGINT)""".stripMargin)
    TxLog.append(spark, dir,
      (0 until 1000).map(_.toLong).toDF("v").repartition(8))
    val got = TxLog.snapshot(spark, dir)
    assert(got.count() == 1000L)
    assert(got.select("id").distinct().count() == 1000L)
    assert(got.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(100L, 100L + 999L * 5))
    // every id is on the step lattice
    assert(got.filter((col("id") - 100) % 5 =!= 0).isEmpty)
  }

  test("explicit insert refuses (GENERATED ALWAYS); truncate passes") {
    import spark.implicits._
    val dir = fresh()
    TxLog.append(spark, dir, Seq("x").toDF("v"))
    intercept[IllegalArgumentException] {
      TxLog.append(spark, dir, Seq((99L, "boom")).toDF("id", "v"))
    }
    graft.plans.GraftDml.sql(spark, s"TRUNCATE TABLE parquet.`$dir`")
    assert(TxLog.snapshot(spark, dir).count() == 0L)
    // post-truncate ids continue above the burned range (monotone)
    TxLog.append(spark, dir, Seq("y").toDF("v"))
    assert(TxLog.snapshot(spark, dir).head().getLong(0) == 2L)
  }

  test("SQL INSERT omits the identity column; ids fill") {
    val dir = fresh()
    graft.plans.GraftDml.sql(spark,
      s"INSERT INTO parquet.`$dir` SELECT 'p' UNION ALL SELECT 'q'")
    val got = TxLog.snapshot(spark, dir).orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(got.map(_.getString(1)).toSet == Set("p", "q"))
  }

  test("concurrent allocators claim disjoint ranges") {
    val dir = fresh()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val ranges = Await.result(Future.sequence((1 to 8).map(_ =>
      Future(IdentityColumns.allocate(spark, dir, 100)))), 60.seconds)
    val spans = ranges.map(first => (first, first + 99))
    // pairwise disjoint
    spans.combinations(2).foreach { case Seq((a1, b1), (a2, b2)) =>
      assert(b1 < a2 || b2 < a1, s"overlap: ($a1,$b1) vs ($a2,$b2)")
    }
    assert(IdentityColumns.highWater(spark, dir) == 800L)
  }

  test("a failed write burns its range — gap, not collision") {
    import spark.implicits._
    val dir = fresh()
    TxLog.append(spark, dir, Seq("a").toDF("v")) // id 1
    // CHECK constraint makes the next append fail AFTER allocation
    TxLog.setCheckConstraints(spark, dir, Seq("v <> 'bad'"))
    intercept[TxLog.ConstraintViolation] {
      TxLog.append(spark, dir, Seq("bad").toDF("v")) // burns id 2
    }
    TxLog.setCheckConstraints(spark, dir, Nil)
    TxLog.append(spark, dir, Seq("c").toDF("v")) // id 3
    assert(TxLog.snapshot(spark, dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("vacuum prunes the ledger to its newest entry; water unchanged") {
    import spark.implicits._
    val dir = fresh()
    (1 to 5).foreach(i => TxLog.append(spark, dir, Seq(s"r$i").toDF("v")))
    val before = IdentityColumns.highWater(spark, dir)
    TxLog.vacuum(spark, dir, retainVersions = 1)
    assert(IdentityColumns.highWater(spark, dir) == before)
    TxLog.append(spark, dir, Seq("post").toDF("v"))
    assert(IdentityColumns.highWater(spark, dir) == before + 1)
  }

  private def freshDefault(): String = {
    val dir = Files.createTempDirectory("ident").toString + "/t"
    graft.plans.GraftDml.sql(spark,
      s"""CREATE TABLE parquet.`$dir`
         |  (id BIGINT GENERATED BY DEFAULT AS IDENTITY, v STRING)""".stripMargin)
    dir
  }

  test("BY DEFAULT: explicit lands verbatim, NULLs fill, water re-syncs") {
    import spark.implicits._
    val dir = freshDefault()
    TxLog.append(spark, dir, Seq("a").toDF("v")) // engine: id 1
    // fully-explicit batch lands verbatim; ledger re-syncs past 200
    TxLog.append(spark, dir, Seq((100L, "x"), (200L, "y")).toDF("id", "v"))
    assert(IdentityColumns.highWater(spark, dir) == 200L)
    TxLog.append(spark, dir, Seq("b").toDF("v")) // engine: id 201
    assert(TxLog.snapshot(spark, dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 100L, 200L, 201L))
    // mixed batch: explicit row verbatim, NULL row fills ABOVE the
    // batch's own supplied max (re-sync happens before assignment)
    TxLog.append(spark, dir,
      Seq((java.lang.Long.valueOf(500L), "e"),
        (null.asInstanceOf[java.lang.Long], "n")).toDF("id", "v"))
    val all = TxLog.snapshot(spark, dir)
    assert(all.count() == 6L)
    assert(all.select("id").distinct().count() == 6L)
    assert(all.filter(col("v") === "e").head().getLong(0) == 500L)
    assert(all.filter(col("v") === "n").head().getLong(0) == 501L)
    assert(IdentityColumns.highWater(spark, dir) == 501L)
    // a water already past the supplied max claims nothing backward
    TxLog.append(spark, dir, Seq((50L, "low")).toDF("id", "v"))
    assert(IdentityColumns.highWater(spark, dir) == 501L)
  }

  test("BY DEFAULT: non-integral supplied type refuses (no silent cast)") {
    import spark.implicits._
    val dir = freshDefault()
    intercept[IllegalArgumentException] { // string ids would cast to NULL
      TxLog.append(spark, dir, Seq(("7", "s")).toDF("id", "v"))
    }
    intercept[IllegalArgumentException] { // fractional doubles truncate
      TxLog.append(spark, dir, Seq((7.5, "d")).toDF("id", "v"))
    }
    // lossless integral widening is fine
    TxLog.append(spark, dir, Seq((7, "i")).toDF("id", "v"))
    assert(TxLog.snapshot(spark, dir).head().getLong(0) == 7L)
  }

  test("ALWAYS still refuses explicit; non-BIGINT identity refuses") {
    import spark.implicits._
    val d1 = fresh()
    intercept[IllegalArgumentException] {
      TxLog.append(spark, d1, Seq((99L, "boom")).toDF("id", "v"))
    }
    val d2 = Files.createTempDirectory("ident").toString + "/t"
    intercept[IllegalArgumentException] {
      graft.plans.GraftDml.sql(spark,
        s"CREATE TABLE parquet.`$d2` (id INT GENERATED ALWAYS AS " +
          "IDENTITY, v STRING)")
    }
    val d3 = Files.createTempDirectory("ident").toString + "/t"
    intercept[IllegalArgumentException] {
      graft.plans.GraftDml.sql(spark,
        s"CREATE TABLE parquet.`$d3` (id INT GENERATED BY DEFAULT AS " +
          "IDENTITY, v STRING)")
    }
  }

  test("BY DEFAULT: racing mixed writers stay globally unique") {
    import spark.implicits._
    val dir = freshDefault()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // 4 explicit writers land disjoint hand-picked ranges, 4 generated
    // writers draw from the ledger — every interleaving must keep ids
    // globally unique and the water past every explicit value
    Await.result(Future.sequence((0 until 8).map { i =>
      Future {
        if (i % 2 == 0)
          TxLog.append(spark, dir, (0 until 50)
            .map(j => (10000L + i * 1000L + j, s"e$i-$j")).toDF("id", "v"))
        else
          TxLog.append(spark, dir,
            (0 until 50).map(j => s"g$i-$j").toDF("v"))
      }
    }), 180.seconds)
    val got = TxLog.snapshot(spark, dir)
    assert(got.count() == 400L)
    assert(got.select("id").distinct().count() == 400L)
    assert(IdentityColumns.highWater(spark, dir) >= 16049L)
    // post-race engine assignment sits above everything
    TxLog.append(spark, dir, Seq("tail").toDF("v"))
    val after = TxLog.snapshot(spark, dir)
    assert(after.count() == 401L)
    assert(after.select("id").distinct().count() == 401L)
    assert(after.filter(col("v") === "tail").head().getLong(0) > 16049L)
  }

  test("streaming append sink fills ids exactly-once across epochs") {
    import spark.implicits._
    val dir = fresh()
    val sink = graft.streaming.TxLogIngest.appendSink(dir)
    sink(Seq("e0a", "e0b").toDF("v"), 0L)
    sink(Seq("e1a").toDF("v"), 1L)
    sink(Seq("e1a").toDF("v"), 1L) // replay: no-op, no ids burned
    val got = TxLog.snapshot(spark, dir)
    assert(got.count() == 3L)
    assert(got.select("id").distinct().count() == 3L)
    assert(IdentityColumns.highWater(spark, dir) == 3L)
  }
}
