package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.TxLog
import org.apache.spark.sql.functions._

class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("dml").toString + "/t"
    graft.Tables.orders(spark, sf("orders"))
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey").write.parquet(dir)
    TxLog.convert(spark, dir)
    dir
  }

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  test("DELETE FROM parquet.`path` WHERE … rewrites only matching files") {
    val dir = freshTable()
    val expect = orders.filter(col("o_orderkey") > 100).count()
    val receipt = GraftDml.sql(spark,
      s"DELETE FROM parquet.`$dir` WHERE o_orderkey <= 100").head()
    assert(receipt.getString(0) == "delete")
    assert(receipt.getLong(2) == orders.count() - expect)
    // key-sorted layout: the delete touches the low files only
    assert(receipt.getLong(3) < 8)
    assert(TxLog.snapshot(spark, dir).count() == expect)
  }

  test("DELETE with an alias-qualified predicate resolves") {
    val dir = freshTable()
    GraftDml.sql(spark,
      s"DELETE FROM parquet.`$dir` AS t WHERE t.o_orderstatus = 'F'")
    assert(TxLog.snapshot(spark, dir)
      .filter(col("o_orderstatus") === "F").count() == 0)
  }

  test("UPDATE … SET … WHERE applies assignments all-at-once to matches only") {
    val dir = freshTable()
    val receipt = GraftDml.sql(spark,
      s"""UPDATE parquet.`$dir`
         |SET o_totalprice = o_totalprice * 2, o_orderpriority = 'X'
         |WHERE o_orderkey <= 40""".stripMargin).head()
    assert(receipt.getString(0) == "update")
    assert(receipt.getLong(2) ==
      orders.filter(col("o_orderkey") <= 40).count())
    val got = TxLog.snapshot(spark, dir)
    val lowSum = got.filter(col("o_orderkey") <= 40)
      .agg(sum("o_totalprice")).head().getDouble(0)
    val expSum = orders.filter(col("o_orderkey") <= 40)
      .agg(sum("o_totalprice")).head().getDouble(0) * 2
    assert(math.abs(lowSum - expSum) < 1e-6)
    assert(got.filter(col("o_orderkey") > 40 &&
      col("o_orderpriority") === "X").count() == 0)
    assert(got.count() == orders.count())
  }

  test("MERGE INTO … UPDATE SET * / INSERT * routes to the merge-on-read upsert") {
    val dir = freshTable()
    val src = orders.filter(col("o_orderkey") <= 30)
      .withColumn("o_totalprice", lit(1.0))
      .unionByName(orders.limit(5)
        .withColumn("o_orderkey", col("o_orderkey") + 5_000_000L))
    src.createOrReplaceTempView("dml_src")
    val before = TxLog.liveFiles(spark, dir).toSet
    val receipt = GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dir` AS t USING dml_src AS s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    assert(receipt.getString(0) == "merge")
    assert(receipt.getLong(2) == src.count())
    // merge-on-read: every pre-existing data file stays live (its
    // matched rows are hidden by a vector, not rewritten away)
    val after = TxLog.liveFiles(spark, dir).toSet
    assert(before.subsetOf(after))
    val got = TxLog.snapshot(spark, dir)
    assert(got.count() == orders.count() + 5)
    assert(got.filter(col("o_orderkey") <= 30)
      .agg(sum("o_totalprice")).head().getDouble(0) ==
      orders.filter(col("o_orderkey") <= 30).count().toDouble)
  }

  test("MERGE … WHEN MATCHED THEN DELETE vectors out the matched keys") {
    val dir = freshTable()
    orders.filter(col("o_orderkey") % 100 === 0).select("o_orderkey")
      .createOrReplaceTempView("dml_dead")
    val receipt = GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dir` t USING dml_dead s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN DELETE""".stripMargin).head()
    assert(receipt.getString(0) == "merge-delete")
    assert(TxLog.snapshot(spark, dir)
      .filter(col("o_orderkey") % 100 === 0).count() == 0)
    assert(TxLog.snapshot(spark, dir).count() ==
      orders.filter(col("o_orderkey") % 100 =!= 0).count())
  }

  test("INSERT INTO a log-managed path commits through the log (plain insert would orphan files)") {
    val dir = freshTable()
    val v0 = TxLog.currentVersion(spark, dir)
    val receipt = GraftDml.sql(spark,
      s"""INSERT INTO parquet.`$dir`
         |SELECT o_orderkey + 7000000, o_custkey, o_orderstatus,
         |       o_totalprice, o_orderdate, o_orderpriority
         |FROM parquet.`$dir` WHERE o_orderkey <= 3""".stripMargin).head()
    assert(receipt.getString(0) == "insert")
    assert(TxLog.currentVersion(spark, dir) == v0 + 1)
    // the appended rows are LOG-visible (not just directory-visible)
    val inserted = orders.filter(col("o_orderkey") <= 3).count()
    assert(receipt.getLong(2) == inserted)
    assert(TxLog.snapshot(spark, dir).count() == orders.count() + inserted)
    assert(TxLog.snapshot(spark, dir, v0).count() == orders.count())
  }

  test("INSERT OVERWRITE replaces the table contents in one commit") {
    val dir = freshTable()
    GraftDml.sql(spark,
      s"""INSERT OVERWRITE parquet.`$dir`
         |SELECT * FROM parquet.`$dir` WHERE o_orderkey <= 5""".stripMargin)
    assert(TxLog.snapshot(spark, dir).count() ==
      orders.filter(col("o_orderkey") <= 5).count())
  }

  test("INSERT INTO an UNMANAGED parquet path appends as a plain write (Spark has no native path INSERT)") {
    val dir = Files.createTempDirectory("dmlins").toString + "/t"
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    GraftDml.sql(spark,
      s"INSERT INTO parquet.`$dir` SELECT 2L, 'b'")
    assert(spark.read.parquet(dir).count() == 2)
    assert(spark.read.parquet(dir).filter(col("k") === 2).head().getString(1) == "b")
  }

  test("general MERGE: conditional clauses, first-match-wins, UPDATE+DELETE mix") {
    val dir = freshTable()
    orders.filter(col("o_orderkey") <= 200)
      .withColumn("o_totalprice", col("o_totalprice") + 7.0)
      .createOrReplaceTempView("gm_src")
    val receipt = GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dir` AS t USING gm_src AS s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED AND t.o_orderstatus = 'F' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
         |""".stripMargin).head()
    assert(receipt.getString(0) == "merge")
    val matched = orders.filter(col("o_orderkey") <= 200)
    val expected = orders
      .filter(col("o_orderkey") > 200 || col("o_orderstatus") =!= "F")
      .withColumn("o_totalprice",
        when(col("o_orderkey") <= 200 && col("o_orderstatus") =!= "F",
          col("o_totalprice") + 7.0).otherwise(col("o_totalprice")))
    val got = TxLog.snapshot(spark, dir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // F-status matches deleted, the rest updated; receipt counts both
    assert(receipt.getLong(2) == matched.count())
  }

  test("general MERGE: WHEN NOT MATCHED BY SOURCE DELETE gives sync semantics") {
    val dir = freshTable()
    orders.filter(col("o_orderkey").between(1, 500))
      .withColumn("o_orderpriority", lit("SYNC"))
      .createOrReplaceTempView("gm_sync")
    GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dir` AS t USING gm_sync AS s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    val expected = orders.filter(col("o_orderkey").between(1, 500))
      .withColumn("o_orderpriority", lit("SYNC"))
    val got = TxLog.snapshot(spark, dir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("general MERGE: NOT MATCHED BY SOURCE conditional UPDATE touches only its slice") {
    val dir = freshTable()
    orders.filter(col("o_orderkey") <= 50).createOrReplaceTempView("gm_nm")
    GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dir` AS t USING gm_nm AS s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'P'
         |  THEN UPDATE SET o_orderpriority = 'STALE'
         |""".stripMargin)
    val expected = orders.withColumn("o_orderpriority",
      when(col("o_orderkey") > 50 && col("o_orderstatus") === "P",
        lit("STALE")).otherwise(col("o_orderpriority")))
    val got = TxLog.snapshot(spark, dir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("general MERGE: INSERT (cols) VALUES back-fills unnamed columns with NULL") {
    val dir = freshTable()
    Seq((90000001L, 42L)).toDF("k", "c")
      .createOrReplaceTempView("gm_ins")
    GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dir` AS t USING gm_ins AS s
         |ON t.o_orderkey = s.k
         |WHEN NOT MATCHED THEN
         |  INSERT (o_orderkey, o_custkey) VALUES (s.k, s.c * 10)
         |""".stripMargin)
    val row = TxLog.snapshot(spark, dir)
      .filter(col("o_orderkey") === 90000001L).collect()
    assert(row.length == 1)
    assert(row.head.getAs[Long]("o_custkey") == 420L)
    assert(row.head.isNullAt(row.head.fieldIndex("o_orderstatus")))
  }

  test("general MERGE: duplicate source matches are rejected") {
    val dir = freshTable()
    orders.filter(col("o_orderkey") <= 20)
      .unionByName(orders.filter(col("o_orderkey") <= 20))
      .createOrReplaceTempView("gm_dup")
    val e = intercept[IllegalArgumentException] {
      GraftDml.sql(spark,
        s"""MERGE INTO parquet.`$dir` AS t USING gm_dup AS s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND s.o_totalprice > 0 THEN DELETE
           |""".stripMargin)
    }
    assert(e.getMessage.contains("nondeterministic"))
  }

  test("general MERGE on a shallow clone localizes only what it touches") {
    val src = freshTable()
    val dst = Files.createTempDirectory("dml_clone").toString + "/c"
    TxLog.cloneTo(spark, src, dst)
    orders.filter(col("o_orderkey") <= 100).createOrReplaceTempView("gm_cl")
    GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dst` AS t USING gm_cl AS s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED AND t.o_totalprice < 100000 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET o_orderpriority = 'BIG'
         |""".stripMargin)
    val expected = orders
      .filter(col("o_orderkey") > 100 || col("o_totalprice") >= 100000)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") <= 100 && col("o_totalprice") >= 100000,
          lit("BIG")).otherwise(col("o_orderpriority")))
    val got = TxLog.snapshot(spark, dst)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(TxLog.snapshot(spark, src).count() == orders.count())
  }

  test("non-DML statements fall through to spark.sql") {
    val n = GraftDml.sql(spark, "SELECT 1 AS one").head().getInt(0)
    assert(n == 1)
  }

  test("DML on an unmanaged path demands a log, names the fix") {
    val dir = Files.createTempDirectory("dmlraw").toString + "/t"
    Seq((1, "a")).toDF("k", "v").write.parquet(dir)
    val e = intercept[IllegalArgumentException] {
      GraftDml.sql(spark, s"DELETE FROM parquet.`$dir` WHERE k = 1")
    }
    assert(e.getMessage.contains("TxLog.convert"))
  }

  private def identTable(mode: String): String = {
    val dir = Files.createTempDirectory("dmlid").toString + "/t"
    GraftDml.sql(spark,
      s"""CREATE TABLE parquet.`$dir`
         |  (id BIGINT GENERATED $mode AS IDENTITY,
         |   k BIGINT, v STRING)""".stripMargin)
    TxLog.append(spark, dir,
      (1L to 5L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartition(1).sortWithinPartitions("k")) // ids 1..5
    dir
  }

  test("MERGE on ALWAYS identity: matched rows keep ids, inserts draw fresh") {
    val dir = identTable("ALWAYS")
    val before = TxLog.snapshot(spark, dir)
      .select("k", "id").as[(Long, Long)].collect().toMap
    Seq((2L, "upd2"), (4L, "upd4"), (9L, "new9"), (10L, "new10"))
      .toDF("k", "v").createOrReplaceTempView("dmlid_src")
    GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dir` AS t USING dmlid_src AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val got = TxLog.snapshot(spark, dir)
    assert(got.count() == 7L)
    assert(got.select("id").distinct().count() == 7L)
    // update images inherited their rows' pre-merge ids
    val after = got.select("k", "id").as[(Long, Long)].collect().toMap
    assert(after(2L) == before(2L) && after(4L) == before(4L))
    assert(got.filter(col("k") === 2L).head().getString(2) == "upd2")
    // inserts drew fresh ids strictly above the pre-merge water
    assert(Seq(9L, 10L).forall(k => after(k) > before.values.max))
  }

  test("MERGE identity guard: SET * with a same-named non-key source id refuses; paired-key SET * passes") {
    val dir = identTable("ALWAYS")
    // source carries its OWN `id` column, but the ON key is k — the
    // star image would write arbitrary s.id values into the identity
    Seq((2L, 777L, "x")).toDF("k", "id", "v")
      .createOrReplaceTempView("dmlid_star")
    val e = intercept[IllegalArgumentException] {
      GraftDml.sql(spark,
        s"""MERGE INTO parquet.`$dir` AS t USING dmlid_star AS s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // the admitted shape: identity IS the ON key, same-named — the
    // star assignment is the join-equal no-op
    val ids = TxLog.snapshot(spark, dir)
      .filter(col("k") <= 2L).select("id", "k").as[(Long, Long)].collect()
    ids.map { case (i, k) => (i, k, s"star$k") }.toSeq
      .toDF("id", "k", "v").createOrReplaceTempView("dmlid_star2")
    GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dir` AS t USING dmlid_star2 AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val got = TxLog.snapshot(spark, dir)
    assert(got.filter(col("v").startsWith("star")).count() == 2L)
    assert(got.select("id").distinct().count() == got.count())
  }

  test("MERGE identity guard: SET id = t.<srcKeyName> resolves target-side and refuses") {
    val dir = identTable("ALWAYS")
    // ON t.id = s.ext — keyedSrc = {ext}; `t.ext` is a TARGET column
    // that happens to share the source key's name: assigning it is a
    // real supply, not the join-equal no-op
    GraftDml.sql(spark,
      s"ALTER TABLE parquet.`$dir` ADD COLUMNS (ext BIGINT)")
    Seq((1L, "x")).toDF("ext", "v").createOrReplaceTempView("dmlid_tq")
    val e = intercept[IllegalArgumentException] {
      GraftDml.sql(spark,
        s"""MERGE INTO parquet.`$dir` AS t USING dmlid_tq AS s
           |ON t.id = s.ext
           |WHEN MATCHED THEN UPDATE SET id = t.ext""".stripMargin)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // the qualified source-side key stays admitted
    GraftDml.sql(spark,
      s"""MERGE INTO parquet.`$dir` AS t USING dmlid_tq AS s
         |ON t.id = s.ext
         |WHEN MATCHED THEN UPDATE SET id = s.ext, v = s.v""".stripMargin)
    assert(TxLog.snapshot(spark, dir)
      .filter(col("id") === 1L).head().getAs[String]("v") == "x")
  }

  test("applyRowChanges fences never-allocated ids on ALWAYS tables") {
    val dir = identTable("ALWAYS")
    val empty = spark.emptyDataFrame
      .withColumn("__graft_file", lit(""))
      .withColumn("__graft_pos", lit(0L)).limit(0)
    // a direct caller smuggling an id beyond the high water refuses
    val e = intercept[IllegalArgumentException] {
      graft.ops.DeletionVectors.applyRowChanges(spark, dir,
        hides = empty,
        appends0 = Seq((999L, 50L, "smuggled")).toDF("id", "k", "v"))
    }
    assert(e.getMessage.contains("never allocated"))
    // images carrying EXISTING ids (the MERGE update shape) pass
    graft.ops.DeletionVectors.applyRowChanges(spark, dir,
      hides = empty,
      appends0 = Seq((1L, 50L, "legit")).toDF("id", "k", "v"))
    assert(TxLog.snapshot(spark, dir).count() == 6L)
  }

  test("injected rule rewrites an analyzer-resolved DELETE to a runnable command") {
    val dir = freshTable()
    val parsed = org.apache.spark.sql.GraftShim.parsePlan(spark,
      s"DELETE FROM parquet.`$dir` WHERE o_orderkey <= 10")
    // drive the analyzer (no CheckAnalysis — stock Spark rejects file
    // DML there), then the rule, exactly as an extensions-built
    // session would compose them
    val resolved = org.apache.spark.sql.GraftShim.analyzeNoCheck(spark, parsed)
    val rewritten = new GraftDml.ResolveGraftDml(spark).apply(resolved)
    assert(rewritten.isInstanceOf[GraftDml.GraftDmlCommand],
      s"rule left the plan as ${rewritten.getClass}")
    val receipt = org.apache.spark.sql.GraftShim
      .ofRows(spark, rewritten).head()
    val expectGone = orders.filter(col("o_orderkey") <= 10).count()
    assert(receipt.getString(0) == "delete" &&
      receipt.getLong(2) == expectGone)
    assert(TxLog.snapshot(spark, dir).count() == orders.count() - expectGone)
  }
}
