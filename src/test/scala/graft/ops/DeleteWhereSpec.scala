package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DeleteWhereSpec extends SparkSpec {

  private lazy val li = graft.Tables.lineitem(spark, sf("lineitem"))
    .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

  test("range delete on a clustered layout rewrites few files, removes exactly the range") {
    val dir = Files.createTempDirectory("dw_range").toString + "/t"
    ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), numPartitions = 24)
      .write.parquet(dir)
    val mf = ZoneMap.build(spark, dir, Seq("l_partkey")).localCheckpoint(true)
    val st = li.agg(min("l_partkey"), max("l_partkey")).head()
    val lo = st.getLong(0).toDouble
    val hi = lo + (st.getLong(1) - st.getLong(0)) / 8.0

    val r = DeleteWhere.range(spark, dir, "l_partkey", lo, hi, Some(mf))
    assert(r.filesTotal == 24)
    // the clustered layout localizes the range: most files untouched
    assert(r.candidates < r.filesTotal / 2,
      s"candidates ${r.candidates} of ${r.filesTotal}")
    val expected = li.filter(col("l_partkey") < lo || col("l_partkey") > hi)
    assert(r.deletedRows == li.count() - expected.count())
    val got = spark.read.parquet(dir)
    assert(got.count() == expected.count())
    assert(got.filter(col("l_partkey") >= lo && col("l_partkey") <= hi).isEmpty)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("key delete through the bloom index touches a handful of files") {
    val dir = Files.createTempDirectory("dw_keys").toString + "/t"
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey").write.parquet(dir)
    val ix = BloomFileIndex.build(spark, dir, "l_orderkey")
      .localCheckpoint(true)
    val keys: Seq[Any] = Seq(1L, 2L, 3L)

    val r = DeleteWhere.byKeys(spark, dir, "l_orderkey", keys, Some(ix))
    // 3 adjacent keys in a key-sorted layout: ~1 candidate file
    assert(r.candidates <= 3, s"candidates ${r.candidates}")
    assert(r.untouched >= 13)
    val expected = li.filter(!col("l_orderkey").isin(keys: _*))
    assert(r.deletedRows == li.count() - expected.count())
    assert(r.deletedRows > 0)
    val got = spark.read.parquet(dir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)

    // replay: the same request deletes nothing more (idempotent purge)
    val r2 = DeleteWhere.byKeys(spark, dir, "l_orderkey", keys, None)
    assert(r2.deletedRows == 0)
  }

  test("NULL in the delete column never matches: NULL rows survive a range delete") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dw_null").toString + "/t"
    Seq[(java.lang.Long, String)]((1L, "a"), (5L, "b"), (null, "c"), (9L, "d"))
      .toDF("k", "v").coalesce(1).write.parquet(dir)
    val r = DeleteWhere.range(spark, dir, "k", 4.0, 6.0)
    assert(r.deletedRows == 1)
    val got = spark.read.parquet(dir).collect()
    assert(got.length == 3)
    assert(got.exists(_.isNullAt(0))) // the NULL row survived
  }

  test("generic predicate delete: compound condition, NULLs survive, caller pruning honored") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dw_pred").toString + "/t"
    Seq[(java.lang.Long, String)]((1L, "a"), (5L, "drop"), (6L, "drop"),
      (null, "drop"), (9L, "keep"))
      .toDF("k", "v").coalesce(1).write.parquet(dir)
    // k > 2 AND v = 'drop' — NULL k makes the conjunct NULL, row survives
    val r = DeleteWhere.where(spark, dir,
      col("k") > 2 && col("v") === "drop")
    assert(r.deletedRows == 2)
    val got = spark.read.parquet(dir).collect()
    assert(got.length == 3)
    assert(got.exists(_.isNullAt(0)))
  }

  test("an all-rows-match delete empties the table without breaking the schema") {
    val dir = Files.createTempDirectory("dw_all").toString + "/t"
    li.limit(100).repartition(2).write.parquet(dir)
    val r = DeleteWhere.range(spark, dir, "l_partkey", 0.0, 1e12)
    assert(r.deletedRows == 100)
  }

  test("distributed key delete matches byKeys; NULL batch keys delete nothing") {
    import spark.implicits._
    val dirA = Files.createTempDirectory("dw_dist_a").toString + "/t"
    val dirB = Files.createTempDirectory("dw_dist_b").toString + "/t"
    Seq(dirA, dirB).foreach(d =>
      li.repartitionByRange(16, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey").write.parquet(d))
    val mf = ZoneMap.build(spark, dirB, Seq("l_orderkey")).localCheckpoint(true)
    val keys = Seq(1L, 2L, 3L)
    val rA = DeleteWhere.byKeys(spark, dirA, "l_orderkey", keys, None)
    val rB = DeleteWhere.byKeysDistributed(spark, dirB, "l_orderkey",
      keys.toDF("l_orderkey"), Some(mf))
    assert(rB.deletedRows == rA.deletedRows && rB.deletedRows > 0)
    // adjacent keys + clustered layout: the probe touches ~1 file
    assert(rB.candidates <= 2 && rB.untouched >= 14)
    val a = spark.read.parquet(dirA)
    val b = spark.read.parquet(dirB).select(a.columns.map(col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    // NULL rows and NULL batch keys never pair up
    val dirN = Files.createTempDirectory("dw_dist_n").toString + "/t"
    Seq[(java.lang.Long, String)]((1L, "a"), (null, "keep"), (9L, "d"))
      .toDF("k", "v").coalesce(1).write.parquet(dirN)
    val rN = DeleteWhere.byKeysDistributed(spark, dirN, "k",
      Seq[java.lang.Long](1L, null).toDF("k"), None)
    assert(rN.deletedRows == 1)
    val got = spark.read.parquet(dirN).collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }

  test("hive table: predicate delete on the PARTITION column drops exactly that partition's rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dw_hivep").toString + "/t"
    val df = spark.range(900).select(
      col("id").as("k"), (col("id") % 3).cast("int").as("p"))
    df.repartition(2).write.partitionBy("p").parquet(dir)
    TxLog.convert(spark, dir)
    // the partition column only exists in the PATH — the hive branch's
    // basePath read makes it visible to the predicate, and the
    // partition-tree restage keeps the layout
    val r = DeleteWhere.where(spark, dir, col("p") === 1 && col("k") % 2 === 0)
    assert(r.deletedRows == 150) // half of p=1's 300 rows
    val got = TxLog.snapshot(spark, dir)
    assert(got.count() == 750)
    assert(got.filter(col("p") === 1).count() == 150)
    assert(got.filter(col("p") =!= 1).count() == 600) // other partitions whole
    assert(TxLog.liveFiles(spark, dir).forall(_.matches("p=\\d/.*")))
  }

  test("range delete at snowflake-id magnitude (>2^53) misses no matching row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dw_big").toString + "/t"
    // ids ~10^18, where a naive long→double zone-map bound can round a
    // file max DOWN and wrongly exclude that file from the candidates
    val base = 1000000000000000000L
    val src = (0 until 10000).map(i => (base + i, i)).toDF("id", "v")
    src.repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.parquet(dir)
    // pin the range ON a file boundary whose exact max rounds down, so
    // the under-reported bound (if unwidened) would skip that file
    val fileMaxes = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(max("id")).collect().map(_.getLong(1))
    val target = fileMaxes.sorted.dropRight(1).find(m =>
      BigDecimal(m.toDouble) < BigDecimal(m)).getOrElse(fileMaxes.sorted.apply(2))
    val lo = Math.nextUp(target.toDouble) // above the naive bound…
    val hi = lo + 10 * 128                // …into the next file's span
    val r = DeleteWhere.range(spark, dir, "id", lo, hi)
    // exactly the double-promoted predicate's rows are gone
    val expected = src.filter(col("id").isNull || col("id") < lo || col("id") > hi)
    assert(r.deletedRows == src.count() - expected.count())
    assert(r.deletedRows > 0, "the range matched nothing — test is vacuous")
    assert(r.candidates < r.filesTotal, "no pruning happened — test is weak")
    val got = spark.read.parquet(dir)
    assert(got.count() == expected.count())
    assert(got.filter(col("id") >= lo && col("id") <= hi).isEmpty)
  }
}
