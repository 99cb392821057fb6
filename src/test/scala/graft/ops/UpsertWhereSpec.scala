package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class UpsertWhereSpec extends SparkSpec {

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  private def same(dir: String, expected: DataFrame): Boolean = {
    val got = spark.read.parquet(dir).select(expected.columns.map(col): _*)
    got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty
  }

  private def layout(dir: String): DataFrame = {
    orders.repartitionByRange(16, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey").write.parquet(dir)
    BloomFileIndex.build(spark, dir, "o_orderkey").localCheckpoint(true)
  }

  private def updatesOf(df: DataFrame): DataFrame = {
    val bump = df.filter(col("o_orderkey").isin(10L, 11L, 12L))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val fresh = df.filter(col("o_orderkey") < 2).select(
      (col("o_orderkey") + 1000000L).as("o_orderkey"), col("o_custkey"),
      lit("N").as("o_orderstatus"), lit(0.0).as("o_totalprice"),
      lit("2000-01-01").cast("timestamp").as("o_orderdate"),
      lit("9-NEW").as("o_orderpriority"))
    bump.unionByName(fresh)
  }

  private def expectedOf(df: DataFrame): DataFrame =
    df.filter(!col("o_orderkey").isin(10L, 11L, 12L))
      .unionByName(updatesOf(df))

  test("pruned merge: adjacent keys touch few files, inserts append, rest untouched") {
    val dir = Files.createTempDirectory("uw_pruned").toString + "/t"
    val ix = layout(dir)
    val up = updatesOf(orders)
    val r = UpsertWhere.byKeys(spark, dir, "o_orderkey", up, Some(ix))
    assert(r.filesTotal == 16)
    // 3 adjacent keys in a key-sorted layout (+ the insert keys' bloom
    // false positives, if any) — far from a full rewrite
    assert(r.candidates < 8, s"candidates ${r.candidates}")
    assert(r.updatedRows == 3)
    assert(r.insertedRows == 2)
    assert(same(dir, expectedOf(orders)))
  }

  test("merge replay is idempotent: same batch twice, same relation") {
    val dir = Files.createTempDirectory("uw_replay").toString + "/t"
    val ix = layout(dir)
    val up = updatesOf(orders)
    UpsertWhere.byKeys(spark, dir, "o_orderkey", up, Some(ix))
    // no index the second time: whole-table merge must land identically
    val r2 = UpsertWhere.byKeys(spark, dir, "o_orderkey", up, None)
    assert(r2.updatedRows == 5) // all 5 batch keys now exist
    assert(r2.insertedRows == 0)
    assert(same(dir, expectedOf(orders)))
  }

  test("all-insert batch with an index appends without touching true negatives") {
    val dir = Files.createTempDirectory("uw_insert").toString + "/t"
    val ix = layout(dir)
    val fresh = orders.filter(col("o_orderkey") < 3).select(
      (col("o_orderkey") + 5000000L).as("o_orderkey"), col("o_custkey"),
      lit("X").as("o_orderstatus"), lit(1.5).as("o_totalprice"),
      lit("2001-01-01").cast("timestamp").as("o_orderdate"),
      lit("0-INS").as("o_orderpriority"))
    val r = UpsertWhere.byKeys(spark, dir, "o_orderkey", fresh, Some(ix))
    assert(r.updatedRows == 0)
    assert(r.insertedRows == 3)
    assert(same(dir, orders.unionByName(fresh)))
  }

  test("empty update batch is a no-op") {
    val dir = Files.createTempDirectory("uw_empty").toString + "/t"
    val ix = layout(dir)
    val r = UpsertWhere.byKeys(spark, dir, "o_orderkey",
      orders.limit(0), Some(ix))
    assert(r.candidates == 0 && r.updatedRows == 0 && r.insertedRows == 0)
    assert(same(dir, orders))
  }
}
