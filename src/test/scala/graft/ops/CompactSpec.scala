package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def visible(dir: String): Seq[String] =
    fsOf(dir).listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(_.getPath.getName).sorted

  /** Multiset equality with the source relation (exceptAll both ways —
    * catches both lost and duplicated rows).
    */
  private def sameRows(dir: String, src: org.apache.spark.sql.DataFrame): Boolean = {
    val got = spark.read.parquet(dir).select(src.columns.map(col): _*)
    got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty
  }

  test("bin-pack merges the small tail, preserves content, and leaves big files in place") {
    val dir = Files.createTempDirectory("compact_pack").toString + "/t"
    // one "big" packed generation + a 16-file small tail
    orders.filter(col("o_orderkey") % 2 === 0).coalesce(1).write.parquet(dir)
    val bigNames = visible(dir)
    orders.filter(col("o_orderkey") % 2 === 1).repartition(16)
      .write.mode("append").parquet(dir)
    assert(visible(dir).size == bigNames.size + 16)
    val bigBytes = fsOf(dir).listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => bigNames.contains(f.getPath.getName)).map(_.getLen).max

    val r = Compact.binPack(spark, dir,
      targetBytes = 64L << 20, smallBytes = bigBytes)
    assert(r.packed == 16)
    assert(r.written == 1)
    assert(r.untouched == bigNames.size.toLong)
    val after = visible(dir)
    assert(after.size == bigNames.size + 1)
    assert(bigNames.forall(after.contains)) // big files physically untouched
    assert(sameRows(dir, orders))

    // already packed: second pass is a structural no-op
    val r2 = Compact.binPack(spark, dir,
      targetBytes = 64L << 20, smallBytes = 1L << 10)
    assert(r2.packed == 0 && visible(dir) == after)
  }

  test("sortCols clusters the packed tail: per-file spans narrow") {
    val dir = Files.createTempDirectory("compact_sort").toString + "/t"
    orders.repartition(32).write.parquet(dir) // 32 unsorted splinters
    Compact.binPack(spark, dir, targetBytes = 16L << 10,
      smallBytes = 64L << 20, sortCols = Seq("o_orderkey"))
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("o_orderkey") - min("o_orderkey")).as("span"))
      .collect().map(_.getAs[Long]("span"))
    assert(spans.length > 2)
    val domain = orders.agg(max("o_orderkey") - min("o_orderkey"))
      .head().getLong(0)
    // range-clustered files each cover a slice, not the whole domain
    assert(spans.sorted.apply(spans.length / 2) < domain / 4)
    assert(spark.read.parquet(dir).count() == orders.count())
  }

  test("zorderCols: the packed tail joins the multi-column skipping regime") {
    val li = graft.Tables.lineitem(spark, sf("lineitem"))
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val dir = Files.createTempDirectory("compact_z").toString + "/t"
    li.repartition(24).write.parquet(dir) // unclustered splinters
    Compact.binPack(spark, dir, targetBytes = 8L << 10,
      smallBytes = 64L << 20, zorderCols = Seq("l_partkey", "l_suppkey"))
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("l_partkey") - min("l_partkey")).as("ps"),
        (max("l_suppkey") - min("l_suppkey")).as("ss"))
      .collect()
    assert(spans.length > 2)
    val st = li.agg(max("l_partkey") - min("l_partkey"),
      max("l_suppkey") - min("l_suppkey")).head()
    // z-layout narrows the MEDIAN span on BOTH columns (a 1-D sort
    // would leave the second column's spans at ~full domain; the small
    // sf0.001 key domains make the interleave coarse, so the bound is
    // 60% — unsorted files sit at ~100%)
    def median(xs: Array[Long]) = xs.sorted.apply(xs.length / 2)
    assert(median(spans.map(_.getAs[Long]("ps"))) < st.getLong(0) * 6 / 10)
    assert(median(spans.map(_.getAs[Long]("ss"))) < st.getLong(1) * 6 / 10)
    assert(spark.read.parquet(dir).count() == li.count())
  }

  test("declared CLUSTER BY: a bare binPack converges the tail to the declared layout") {
    val dir = Files.createTempDirectory("compact_cb").toString + "/t"
    orders.repartition(32).write.parquet(dir) // unsorted splinters
    TxLog.convert(spark, dir)
    TxLog.setClusterColumns(spark, dir, Seq("o_orderkey"))
    // NO column list at the call site — the declaration decides
    Compact.binPack(spark, dir, targetBytes = 16L << 10,
      smallBytes = 64L << 20)
    val spans = TxLog.read(spark, dir)
      .groupBy(input_file_name())
      .agg((max("o_orderkey") - min("o_orderkey")).as("span"))
      .collect().map(_.getAs[Long]("span"))
    val domain = orders.agg(max("o_orderkey") - min("o_orderkey"))
      .head().getLong(0)
    assert(spans.length > 2)
    assert(spans.sorted.apply(spans.length / 2) < domain / 4)
    assert(TxLog.read(spark, dir).exceptAll(orders).isEmpty &&
      orders.exceptAll(TxLog.read(spark, dir)).isEmpty)
    // two declared columns route through the Z-order path the same way
    val li = graft.Tables.lineitem(spark, sf("lineitem"))
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val dir2 = Files.createTempDirectory("compact_cb2").toString + "/t"
    li.repartition(24).write.parquet(dir2)
    TxLog.convert(spark, dir2)
    TxLog.setClusterColumns(spark, dir2, Seq("l_partkey", "l_suppkey"))
    Compact.binPack(spark, dir2, targetBytes = 8L << 10,
      smallBytes = 64L << 20)
    val zs = TxLog.read(spark, dir2)
      .groupBy(input_file_name())
      .agg((max("l_partkey") - min("l_partkey")).as("ps"),
        (max("l_suppkey") - min("l_suppkey")).as("ss"))
      .collect()
    val st = li.agg(max("l_partkey") - min("l_partkey"),
      max("l_suppkey") - min("l_suppkey")).head()
    def median(xs: Array[Long]) = xs.sorted.apply(xs.length / 2)
    // 4/5 bound: this test pins the ROUTING (declaration → Z path),
    // not the interleave quality (the plain-dir z test above does
    // that) — sf0.001's coarse domains + repartitionByRange's sampled
    // boundaries jitter the medians; unsorted splinters sit at ~100%
    assert(median(zs.map(_.getAs[Long]("ps"))) < st.getLong(0) * 4 / 5)
    assert(median(zs.map(_.getAs[Long]("ss"))) < st.getLong(1) * 4 / 5)
    // an explicit call-site list still wins over the declaration
    // (metadata says Z on two cols; the caller asks 1-D on l_orderkey)
    val dir3 = Files.createTempDirectory("compact_cb3").toString + "/t"
    li.repartition(8).write.parquet(dir3)
    TxLog.convert(spark, dir3)
    TxLog.setClusterColumns(spark, dir3, Seq("l_partkey", "l_suppkey"))
    Compact.binPack(spark, dir3, targetBytes = 16L << 10,
      smallBytes = 64L << 20, sortCols = Seq("l_orderkey"))
    val os = TxLog.read(spark, dir3)
      .groupBy(input_file_name())
      .agg((max("l_orderkey") - min("l_orderkey")).as("span"))
      .collect().map(_.getAs[Long]("span"))
    val odom = li.agg(max("l_orderkey") - min("l_orderkey")).head().getLong(0)
    // had the DECLARATION won, files would be z-ordered on partkey/
    // suppkey and l_orderkey spans would sit at ~the full domain
    assert(median(os) < odom / 2)
    // declaring a column the schema lacks refuses (pin present)
    val dir4 = Files.createTempDirectory("compact_cb4").toString + "/t"
    TxLog.convert(spark, dir4)
    TxLog.setTableSchema(spark, dir4, orders.schema, 0)
    intercept[IllegalArgumentException] {
      TxLog.setClusterColumns(spark, dir4, Seq("nope"))
    }
  }

  test("crash after commit marker: recover finishes the move + deletes, idempotently") {
    val dir = Files.createTempDirectory("compact_crash").toString + "/t"
    orders.repartition(8).write.parquet(dir)
    val r = Compact.stage(spark, dir,
      targetBytes = 64L << 20, smallBytes = 64L << 20, sortCols = Nil)
    assert(r.packed == 8)
    // crashed writer: stage + marker exist, olds still visible
    assert(fsOf(dir).exists(new org.apache.hadoop.fs.Path(dir, "_compact_commit")))
    assert(visible(dir).size == 8)

    Compact.recover(spark, dir)
    assert(visible(dir).size == 1)
    assert(sameRows(dir, orders))
    Compact.recover(spark, dir) // recover-after-recover: no-op
    assert(visible(dir).size == 1)
    assert(sameRows(dir, orders))
  }

  test("crash before the marker is complete: table untouched, stage discarded") {
    val dir = Files.createTempDirectory("compact_torn").toString + "/t"
    orders.repartition(4).write.parquet(dir)
    val fs = fsOf(dir)
    val stage = new org.apache.hadoop.fs.Path(dir, ".compact_stage")
    fs.mkdirs(stage)
    // a torn marker (no END): must be treated as uncommitted
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_compact_commit"), true)
    out.write("V1\nOLDS\n".getBytes("UTF-8")); out.close()

    Compact.recover(spark, dir)
    assert(visible(dir).size == 4)
    assert(sameRows(dir, orders))
    assert(!fs.exists(stage))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_compact_commit")))
  }

  test("zone-map refresh after compaction touches only the packed files") {
    val dir = Files.createTempDirectory("compact_zm").toString + "/t"
    orders.repartition(12).write.parquet(dir)
    // materialize: a real deployment persists the manifest — a lazy
    // lineage would re-read files compaction has deleted
    val mf0 = ZoneMap.build(spark, dir, Seq("o_orderkey")).localCheckpoint(true)
    val r = Compact.binPack(spark, dir,
      targetBytes = 64L << 20, smallBytes = 64L << 20)
    assert(r.written == 1)
    val (mf1, footersRead) = ZoneMap.refresh(spark, dir, mf0, Seq("o_orderkey"))
    assert(footersRead == 1) // O(packed output), not O(table)
    val live = spark.read.parquet(dir).inputFiles.toSet
    assert(mf1.select("file").distinct().collect().map(_.getString(0)).toSet == live)
  }
}
