package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.TxLog
import org.apache.spark.sql.functions._

class GraftDdlSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("ddl").toString + "/t"

  test("CREATE TABLE pins schema, partition layout and constraints; first INSERT honors all three") {
    val dir = freshDir()
    val receipt = GraftDml.sql(spark,
      s"""CREATE TABLE parquet.`$dir`
         |  (k BIGINT NOT NULL, v STRING, part STRING,
         |   CONSTRAINT pos CHECK (k > 0))
         |PARTITIONED BY (part)""".stripMargin).head()
    assert(receipt.getString(0) == "create-table")
    assert(TxLog.exists(spark, dir))
    assert(TxLog.snapshot(spark, dir).count() == 0)
    // the EMPTY table already reads with the declared schema
    assert(TxLog.snapshot(spark, dir).columns.toSeq == Seq("k", "v", "part"))
    assert(TxLog.partitionColumns(spark, dir) == Seq("part"))
    // first insert lands hive-partitioned (the pin, not file inference)
    GraftDml.sql(spark,
      s"INSERT INTO parquet.`$dir` SELECT 1L, 'a', 'p1' UNION ALL SELECT 2L, 'b', 'p2'")
    assert(TxLog.liveFiles(spark, dir).forall(_.startsWith("part=")))
    assert(TxLog.snapshot(spark, dir).count() == 2)
    // CHECK and NOT NULL both enforce on the staged delta
    intercept[TxLog.ConstraintViolation] {
      GraftDml.sql(spark, s"INSERT INTO parquet.`$dir` SELECT -1L, 'x', 'p1'")
    }
    intercept[TxLog.ConstraintViolation] {
      GraftDml.sql(spark,
        s"INSERT INTO parquet.`$dir` SELECT CAST(NULL AS BIGINT), 'x', 'p1'")
    }
    assert(TxLog.snapshot(spark, dir).count() == 2)
  }

  test("CLUSTER BY: CREATE declares, maintenance converges, ALTER re-points, NONE clears") {
    val dir = freshDir()
    GraftDml.sql(spark,
      s"CREATE TABLE parquet.`$dir` (k BIGINT, v STRING) CLUSTER BY (k)")
    assert(TxLog.clusterColumns(spark, dir) == Seq("k"))
    // splinter appends, then a BARE optimize — the declaration routes
    (1L to 4000L).map(i => (i, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("cb_rows")
    (0 until 8).foreach { i =>
      GraftDml.sql(spark,
        s"INSERT INTO parquet.`$dir` SELECT k, v FROM cb_rows WHERE k % 8 = $i")
    }
    graft.GraftExtensions.installInto(spark)
    spark.sql(s"SELECT * FROM graft_optimize('$dir')").collect()
    // the 8 splinters pack into one file; with the declaration routed
    // it reads back fully SORTED on k (an undeclared pack shuffles —
    // the modular splinter interleave would never come out ordered)
    assert(TxLog.liveEntries(spark, dir).size == 1)
    val ks = TxLog.read(spark, dir).select("k").collect().map(_.getLong(0))
    assert(ks.length == 4000 && (ks sameElements ks.sorted))
    // ALTER re-points, NONE clears
    GraftDml.sql(spark, s"ALTER TABLE parquet.`$dir` CLUSTER BY (v)")
    assert(TxLog.clusterColumns(spark, dir) == Seq("v"))
    GraftDml.sql(spark, s"ALTER TABLE parquet.`$dir` CLUSTER BY NONE")
    assert(TxLog.clusterColumns(spark, dir).isEmpty)
  }

  test("CTAS lands the query as a log-managed v0; IF NOT EXISTS is a no-op; bare CTAS on existing errors") {
    val dir = freshDir()
    val receipt = GraftDml.sql(spark,
      s"CREATE TABLE parquet.`$dir` AS SELECT id AS k, id * 2 AS v FROM range(100)").head()
    assert(receipt.getString(0) == "create-table-as")
    assert(receipt.getLong(2) == 100)
    assert(TxLog.snapshot(spark, dir).agg(sum("v")).head().getLong(0) == 9900)
    val again = GraftDml.sql(spark,
      s"CREATE TABLE IF NOT EXISTS parquet.`$dir` AS SELECT 1 AS only").head()
    assert(again.getString(0) == "create-table-exists")
    assert(TxLog.snapshot(spark, dir).count() == 100)
    intercept[IllegalArgumentException] {
      GraftDml.sql(spark, s"CREATE TABLE parquet.`$dir` AS SELECT 1 AS only")
    }
  }

  test("CREATE OR REPLACE is one overwrite commit with the old versions still readable") {
    val dir = freshDir()
    GraftDml.sql(spark,
      s"CREATE TABLE parquet.`$dir` AS SELECT id AS k FROM range(10)")
    val v0 = TxLog.currentVersion(spark, dir)
    GraftDml.sql(spark,
      s"CREATE OR REPLACE TABLE parquet.`$dir` AS SELECT id AS k, 'x' AS tag FROM range(3)")
    assert(TxLog.snapshot(spark, dir).count() == 3)
    assert(TxLog.snapshot(spark, dir).columns.toSeq == Seq("k", "tag"))
    // time travel to the pre-replace version: old rows, old width
    assert(TxLog.snapshot(spark, dir, v0).count() == 10)
    assert(TxLog.snapshot(spark, dir, v0).columns.toSeq == Seq("k"))
    // OR REPLACE on a missing table creates it
    val dir2 = freshDir()
    GraftDml.sql(spark,
      s"CREATE OR REPLACE TABLE parquet.`$dir2` AS SELECT 1 AS one")
    assert(TxLog.snapshot(spark, dir2).count() == 1)
  }

  test("TRUNCATE empties in one commit; the pre-truncate snapshot still reads") {
    val dir = freshDir()
    GraftDml.sql(spark,
      s"CREATE TABLE parquet.`$dir` AS SELECT id AS k FROM range(50)")
    val v = TxLog.currentVersion(spark, dir)
    val receipt = GraftDml.sql(spark, s"TRUNCATE TABLE parquet.`$dir`").head()
    assert(receipt.getString(0) == "truncate-table")
    assert(TxLog.snapshot(spark, dir).count() == 0)
    assert(TxLog.snapshot(spark, dir).columns.toSeq == Seq("k"))
    assert(TxLog.snapshot(spark, dir, v).count() == 50)
  }

  test("DROP TABLE removes a managed table; refuses unmanaged dirs; IF EXISTS is silent") {
    val dir = freshDir()
    GraftDml.sql(spark, s"CREATE TABLE parquet.`$dir` AS SELECT 1 AS one")
    GraftDml.sql(spark, s"DROP TABLE parquet.`$dir`")
    assert(!TxLog.exists(spark, dir))
    val plain = freshDir()
    Seq((1, "a")).toDF("k", "v").write.parquet(plain)
    intercept[IllegalArgumentException] {
      GraftDml.sql(spark, s"DROP TABLE parquet.`$plain`")
    }
    assert(spark.read.parquet(plain).count() == 1) // untouched
    GraftDml.sql(spark, s"DROP TABLE IF EXISTS parquet.`${freshDir()}`")
  }

  test("ADD COLUMNS widens from the next version on; old snapshots keep their width") {
    val dir = freshDir()
    GraftDml.sql(spark,
      s"CREATE TABLE parquet.`$dir` AS SELECT id AS k FROM range(5)")
    val v0 = TxLog.currentVersion(spark, dir)
    val receipt = GraftDml.sql(spark,
      s"ALTER TABLE parquet.`$dir` ADD COLUMNS (score DOUBLE, tag STRING)").head()
    assert(receipt.getString(0) == "add-columns")
    val now = TxLog.snapshot(spark, dir)
    assert(now.columns.toSeq == Seq("k", "score", "tag"))
    assert(now.filter(col("score").isNull && col("tag").isNull).count() == 5)
    assert(TxLog.snapshot(spark, dir, v0).columns.toSeq == Seq("k"))
    // new writes carry the evolved width
    GraftDml.sql(spark,
      s"INSERT INTO parquet.`$dir` SELECT 100L, 0.5D, 'new'")
    assert(TxLog.snapshot(spark, dir)
      .filter(col("tag") === "new").count() == 1)
    intercept[IllegalArgumentException] {
      GraftDml.sql(spark, s"ALTER TABLE parquet.`$dir` ADD COLUMNS (k BIGINT)")
    }
  }

  test("DROP COLUMN narrows reads; constraint-referenced and partition columns refuse") {
    val dir = freshDir()
    GraftDml.sql(spark,
      s"CREATE TABLE parquet.`$dir` AS SELECT id AS k, id * 2 AS v, 'x' AS tag FROM range(5)")
    val v0 = TxLog.currentVersion(spark, dir)
    GraftDml.sql(spark, s"ALTER TABLE parquet.`$dir` DROP COLUMN tag")
    assert(TxLog.snapshot(spark, dir).columns.toSeq == Seq("k", "v"))
    assert(TxLog.snapshot(spark, dir, v0).columns.toSeq == Seq("k", "v", "tag"))
    // IF EXISTS on a missing column is silent; bare errors
    GraftDml.sql(spark, s"ALTER TABLE parquet.`$dir` DROP COLUMN IF EXISTS ghost")
    intercept[IllegalArgumentException] {
      GraftDml.sql(spark, s"ALTER TABLE parquet.`$dir` DROP COLUMN ghost")
    }
    // a CHECK-referenced column refuses to vanish
    TxLog.setCheckConstraints(spark, dir, Seq("v >= 0"))
    intercept[IllegalArgumentException] {
      GraftDml.sql(spark, s"ALTER TABLE parquet.`$dir` DROP COLUMN v")
    }
  }

  test("ADD/DROP CONSTRAINT: existing rows validate, writes enforce, drop releases") {
    val dir = freshDir()
    GraftDml.sql(spark,
      s"CREATE TABLE parquet.`$dir` AS SELECT * FROM VALUES (1L), (5L) t(k)")
    // a constraint existing rows violate refuses
    intercept[TxLog.ConstraintViolation] {
      GraftDml.sql(spark,
        s"ALTER TABLE parquet.`$dir` ADD CONSTRAINT big CHECK (k > 3)")
    }
    // a satisfiable one lands and every write path enforces it
    GraftDml.sql(spark,
      s"ALTER TABLE parquet.`$dir` ADD CONSTRAINT pos CHECK (k > 0)")
    intercept[TxLog.ConstraintViolation] {
      GraftDml.sql(spark, s"INSERT INTO parquet.`$dir` SELECT -1L")
    }
    // named at CREATE + named here are both addressable by DROP
    GraftDml.sql(spark, s"ALTER TABLE parquet.`$dir` DROP CONSTRAINT pos")
    GraftDml.sql(spark, s"INSERT INTO parquet.`$dir` SELECT -1L")
    assert(TxLog.snapshot(spark, dir).count() == 3L)
    // IF EXISTS is silent; a missing name without it errors
    GraftDml.sql(spark,
      s"ALTER TABLE parquet.`$dir` DROP CONSTRAINT IF EXISTS nope")
    intercept[IllegalArgumentException] {
      GraftDml.sql(spark, s"ALTER TABLE parquet.`$dir` DROP CONSTRAINT nope")
    }
  }

  test("a CREATE-named constraint is addressable by DROP CONSTRAINT") {
    val dir = freshDir()
    GraftDml.sql(spark,
      s"CREATE TABLE parquet.`$dir` (k BIGINT, CONSTRAINT pos CHECK (k > 0))")
    intercept[TxLog.ConstraintViolation] {
      GraftDml.sql(spark, s"INSERT INTO parquet.`$dir` SELECT -5L")
    }
    GraftDml.sql(spark, s"ALTER TABLE parquet.`$dir` DROP CONSTRAINT pos")
    GraftDml.sql(spark, s"INSERT INTO parquet.`$dir` SELECT -5L")
    assert(TxLog.snapshot(spark, dir).count() == 1L)
  }

  test("RENAME COLUMN is metadata-only through column mapping") {
    val dir = freshDir()
    GraftDml.sql(spark, s"CREATE TABLE parquet.`$dir` AS SELECT 1 AS k")
    val receipt = GraftDml.sql(spark,
      s"ALTER TABLE parquet.`$dir` RENAME COLUMN k TO kk").head()
    assert(receipt.getString(0) == "rename-column")
    assert(TxLog.snapshot(spark, dir).columns.toSeq == Seq("kk"))
    assert(TxLog.snapshot(spark, dir).head().getInt(0) == 1)
    // the data file still spells the physical name — nothing rewrote
    val files = TxLog.liveFiles(spark, dir)
    assert(files.forall(n =>
      spark.read.parquet(s"$dir/$n").columns.toSeq == Seq("k")))
  }

  test("the injected rule rewrites the analyzer-resolved DDL shapes (v1 catalog commands included)") {
    // session-catalog resolution has ALREADY converted CREATE/CTAS to
    // v1 commands and DROP to a ResolvedIdentifier when an injected
    // rule runs — the rule must catch those shapes, or a literal
    // spark.sql CTAS would create a metastore table in a phantom
    // `parquet` database
    def viaRule(stmt: String): Unit = {
      val analyzed = org.apache.spark.sql.GraftShim.analyzeNoCheck(spark,
        org.apache.spark.sql.GraftShim.parsePlan(spark, stmt))
      val rewritten = new GraftDml.ResolveGraftDml(spark).apply(analyzed)
      assert(rewritten.isInstanceOf[GraftDml.GraftDmlCommand], stmt)
      org.apache.spark.sql.GraftShim.ofRows(spark, rewritten).collect()
    }
    val dir = freshDir()
    viaRule(s"CREATE TABLE parquet.`$dir` AS SELECT id AS k FROM range(7)")
    assert(TxLog.snapshot(spark, dir).count() == 7)
    viaRule(s"TRUNCATE TABLE parquet.`$dir`")
    assert(TxLog.snapshot(spark, dir).count() == 0)
    viaRule(s"DROP TABLE parquet.`$dir`")
    assert(!TxLog.exists(spark, dir))
    val dir2 = freshDir()
    viaRule(s"CREATE TABLE parquet.`$dir2` (k BIGINT NOT NULL, v STRING)")
    assert(TxLog.snapshot(spark, dir2).columns.toSeq == Seq("k", "v"))
    assert(TxLog.checkConstraints(spark, dir2) == Seq("k IS NOT NULL"))
  }
}
