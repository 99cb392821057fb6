package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFileIndexSpec extends SparkSpec {

  private lazy val li = graft.Tables.lineitem(spark, sf("lineitem"))

  test("point probe prunes to the owning file(s); pruned read equals plain filter") {
    val dir = Files.createTempDirectory("bfi").toString + "/t"
    // hash-partitioned by orderkey: each key's rows live in ONE file,
    // and the layout is unclustered on the probe column — the zone-map
    // worst case, the bloom-index home turf
    li.repartition(16, col("l_orderkey")).write.parquet(dir)
    val idx = BloomFileIndex.build(spark, dir, "l_orderkey",
      expectedPerFile = 1L << 16)
    val all = spark.read.parquet(dir)
    assert(idx.count() == all.inputFiles.length)

    val keys = li.select("l_orderkey").distinct().orderBy("l_orderkey")
      .limit(3).collect().map(_.getLong(0)).toSeq
    val cand = BloomFileIndex.candidateFiles(idx, all.inputFiles.toSeq, keys)
    // 3 keys hash to ≤3 files; fp ~1% adds at most a couple
    assert(cand.length <= 6, s"${cand.length}/${all.inputFiles.length} candidates")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(canon(BloomFileIndex.prunedRead(spark, dir, idx, "l_orderkey", keys)) ==
      canon(all.filter(col("l_orderkey").isin(keys: _*))))
  }

  test("no false negatives: every sampled key's rows survive the prune") {
    val dir = Files.createTempDirectory("bfi_fn").toString + "/t"
    li.repartition(8).write.parquet(dir) // round-robin: keys scatter
    val idx = BloomFileIndex.build(spark, dir, "l_suppkey",
      expectedPerFile = 1L << 16)
    val keys = li.select("l_suppkey").distinct().orderBy("l_suppkey")
      .limit(20).collect().map(_.getLong(0)).toSeq
    val expected = li.filter(col("l_suppkey").isin(keys: _*)).count()
    assert(BloomFileIndex.prunedRead(spark, dir, idx, "l_suppkey", keys)
      .count() == expected)
  }

  test("buildWithStats: one scan yields a bloom index AND a ZoneMap-consumable manifest") {
    val dir = Files.createTempDirectory("bfi_both").toString + "/t"
    ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), numPartitions = 8)
      .write.parquet(dir)
    val (bloomIdx, manifest) = BloomFileIndex.buildWithStats(
      spark, dir, "l_orderkey", Seq("l_partkey", "l_suppkey"),
      expectedPerFile = 1L << 16)

    // the manifest equals ZoneMap's footer-only build exactly
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getLong(4))).toSet
    assert(canon(manifest) ==
      canon(ZoneMap.build(spark, dir, Seq("l_partkey", "l_suppkey"))))

    // the bloom side prunes the point probe and loses nothing
    val all = spark.read.parquet(dir)
    val key = li.agg(min("l_orderkey")).head().getLong(0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows(BloomFileIndex.prunedRead(spark, dir, bloomIdx, "l_orderkey",
      Seq(key))) == rows(all.filter(col("l_orderkey") === key)))

    // and ZoneMap.prunedRead consumes the combined manifest unchanged
    val st = li.agg(min("l_partkey"), max("l_partkey")).head()
    val hi = st.getLong(0) + (st.getLong(1) - st.getLong(0)) / 8
    assert(rows(ZoneMap.prunedRead(spark, dir, manifest, "l_partkey",
        st.getLong(0).toDouble, hi.toDouble)) ==
      rows(all.filter(col("l_partkey") >= st.getLong(0) && col("l_partkey") <= hi)))
  }

  test("refresh: appended files scanned, vanished dropped, unknown files never pruned") {
    val dir = Files.createTempDirectory("bfi_rf").toString + "/t"
    li.filter(col("l_orderkey") % 2 === 0).repartition(4).write.parquet(dir)
    val idx0 = BloomFileIndex.build(spark, dir, "l_orderkey",
      expectedPerFile = 1L << 16)
    li.filter(col("l_orderkey") % 2 === 1).repartition(2)
      .write.mode("append").parquet(dir)

    // before refresh: the 2 new files are unknown → always candidates
    val all = spark.read.parquet(dir)
    val oddKey = li.filter(col("l_orderkey") % 2 === 1)
      .agg(min("l_orderkey")).head().getLong(0)
    val cand = BloomFileIndex.candidateFiles(idx0, all.inputFiles.toSeq, Seq(oddKey))
    assert(all.inputFiles.count(f => !idx0.collect().map(_.getString(0)).contains(f))
      <= cand.length)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(canon(BloomFileIndex.prunedRead(spark, dir, idx0, "l_orderkey", Seq(oddKey))) ==
      canon(all.filter(col("l_orderkey") === oddKey)))

    val (idx1, scanned) = BloomFileIndex.refresh(spark, dir, idx0, "l_orderkey",
      expectedPerFile = 1L << 16)
    assert(scanned == 2L)
    assert(idx1.count() == all.inputFiles.length)
    val (idx2, scanned2) = BloomFileIndex.refresh(spark, dir, idx1, "l_orderkey",
      expectedPerFile = 1L << 16)
    assert(scanned2 == 0L && idx2.count() == idx1.count())
  }
}
