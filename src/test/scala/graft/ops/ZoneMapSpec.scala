package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpec {

  private lazy val li = graft.Tables.lineitem(spark, sf("lineitem"))

  test("manifest agrees with a full scan's per-file min/max and row counts") {
    val dir = Files.createTempDirectory("zm_build").toString + "/t"
    li.repartition(8).write.parquet(dir)
    val mf = ZoneMap.build(spark, dir, Seq("l_partkey", "l_quantity"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // 8 files × 2 columns, and footer stats equal scanned stats
    assert(mf.size == 16)
    val scanned = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").cast("double"), max("l_partkey").cast("double"),
        min("l_quantity"), max("l_quantity"), count(lit(1)))
      .collect()
    scanned.foreach { r =>
      val f = r.getString(0)
      assert(mf((f, "l_partkey")) == ((r.getDouble(1), r.getDouble(2), r.getLong(5))))
      assert(mf((f, "l_quantity")) == ((r.getDouble(3), r.getDouble(4), r.getLong(5))))
    }
  }

  test("row-group manifest: per-block stats roll up to the file manifest, estimates bound the scan") {
    val dir = Files.createTempDirectory("zm_rg").toString + "/t"
    // small block size + replicated rows force several row groups/file
    val wide = (0 until 20).map(i =>
      li.select(col("l_orderkey"), (col("l_partkey") + lit(i * 1000L)).as("l_partkey")))
      .reduce(_.unionByName(_))
    wide.orderBy("l_partkey").coalesce(2)
      .write.option("parquet.block.size", 32 * 1024).parquet(dir)
    val rg = ZoneMap.buildRowGroups(spark, dir, Seq("l_partkey"))
    val nRg = rg.count()
    assert(nRg > 4, s"expected multiple row groups, got $nRg") // blocks split
    // per-file roll-up of the rg manifest == the per-file manifest
    val rolled = rg.groupBy("file")
      .agg(min("min_value").as("mn"), max("max_value").as("mx"),
        sum("rg_rows").as("rows"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    ZoneMap.build(spark, dir, Seq("l_partkey")).collect().foreach { r =>
      assert(rolled(r.getString(0)) ==
        ((r.getDouble(2), r.getDouble(3), r.getLong(4))))
    }
    // a narrow range touches FEWER row groups than the whole table,
    // and the row estimate upper-bounds the true matching count
    val st = li.agg(min("l_partkey"), max("l_partkey")).head()
    val lo = st.getLong(0).toDouble
    val hi = lo + (st.getLong(1) - st.getLong(0)) / 8.0
    val cand = ZoneMap.candidateRowGroups(rg, "l_partkey", lo, hi)
    assert(cand.size < nRg, s"${cand.size} of $nRg")
    val est = ZoneMap.estimateRows(rg, "l_partkey", lo, hi)
    val actual = spark.read.parquet(dir)
      .filter(col("l_partkey") >= lo && col("l_partkey") <= hi).count()
    val total = spark.read.parquet(dir).count()
    assert(est >= actual && est < total / 4, s"est=$est actual=$actual total=$total")
    // a range outside the domain estimates zero
    assert(ZoneMap.estimateRows(rg, "l_partkey", 1e15, 2e15) == 0L)
  }

  test("row-group routing: reads and deletes consume the rg candidates — fewer groups, same answer") {
    val dir = Files.createTempDirectory("zm_route").toString + "/t"
    // clustered multi-row-group layout: 4 range-partitioned files,
    // each split into many small row groups
    val wide = (0 until 10).map(i =>
      li.select(col("l_orderkey"),
        (col("l_partkey") + lit(i * 1000L)).as("l_partkey"),
        col("l_quantity")))
      .reduce(_.unionByName(_))
    wide.repartitionByRange(4, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.option("parquet.block.size", 32 * 1024).parquet(dir)
    TxLog.convert(spark, dir)
    val rg = ZoneMap.buildRowGroups(spark, dir, Seq("l_partkey"))
    val st = wide.agg(min("l_partkey"), max("l_partkey")).head()
    val (dLo, dHi) = (st.getLong(0).toDouble, st.getLong(1).toDouble)
    val lo = dLo + (dHi - dLo) * 0.40
    val hi = dLo + (dHi - dLo) * 0.45
    // ROUTING METRIC: the rg-granular candidate set is a strict
    // subset of the row groups the file-level plan would decompress
    // (all groups of every candidate file)
    val candRg = ZoneMap.candidateRowGroups(rg, "l_partkey", lo, hi)
    val fileCand = candRg.map(_._1).distinct
    val fileLevelRgs = rg.filter(col("file").isin(fileCand: _*)).count()
    assert(candRg.size < fileLevelRgs,
      s"expected fewer groups: ${candRg.size} of $fileLevelRgs")
    // routed read == unpruned filtered read, opening only candidates
    val routed = ZoneMap.routedRead(spark, dir, rg, "l_partkey", lo, hi)
    val direct = TxLog.read(spark, dir)
      .filter(col("l_partkey") >= lo && col("l_partkey") <= hi)
    assert(routed.count() == direct.count() && direct.count() > 0)
    assert(routed.exceptAll(direct).isEmpty)
    // a range no row group can hold: empty frame, zero estimate
    assert(ZoneMap.estimateRows(rg, "l_partkey", 1e15, 2e15) == 0L)
    assert(ZoneMap.routedRead(spark, dir, rg, "l_partkey", 1e15, 2e15)
      .count() == 0L)
    // an UNCOVERED file never prunes: drop one file's manifest rows,
    // its rows must still be served
    val dropped = rg.select("file").distinct().limit(1)
      .head().getString(0)
    val partial = rg.filter(col("file") =!= dropped)
    val routedPartial =
      ZoneMap.routedRead(spark, dir, partial, "l_partkey", lo, hi)
    assert(routedPartial.count() == direct.count())
    // routed DELETE: only candidate files rewrite, result identical
    val expectSurvivors = TxLog.read(spark, dir)
      .filter(col("l_partkey").isNull ||
        col("l_partkey") < lo || col("l_partkey") > hi).count()
    val (receipt, est) =
      DeleteWhere.rangeRowGroups(spark, dir, "l_partkey", lo, hi, rg)
    assert(est >= receipt.deletedRows && receipt.deletedRows > 0)
    assert(receipt.candidates < receipt.filesTotal,
      s"expected pruning: ${receipt.candidates} of ${receipt.filesTotal}")
    assert(TxLog.read(spark, dir).count() == expectSurvivors)
    assert(TxLog.read(spark, dir)
      .filter(col("l_partkey") >= lo && col("l_partkey") <= hi)
      .count() == 0L)
  }

  test("string manifest: lexicographic spans from footers, equality read prunes") {
    val docs = graft.Tables.table(spark, sf(""), "documents")
    val dir = Files.createTempDirectory("zm_str").toString + "/t"
    docs.repartitionByRange(8, col("lang"))
      .sortWithinPartitions("lang").write.parquet(dir)
    val mf = ZoneMap.buildString(spark, dir, Seq("lang"))
    // footer spans agree with scanned spans
    val scanned = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("lang").as("mn"), max("lang").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    mf.collect().foreach { r =>
      assert(scanned(r.getString(0)) == ((r.getString(2), r.getString(3))))
    }
    // equality read: few candidates, identical result
    val all = spark.read.parquet(dir).inputFiles.toSeq
    val cand = ZoneMap.candidateFilesString(mf, all, "lang", "en")
    assert(cand.size < all.size, s"${cand.size} of ${all.size}")
    val got = ZoneMap.prunedReadString(spark, dir, mf, "lang", "en")
    val want = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // a value no file can hold prunes everything, result still sound
    assert(ZoneMap.prunedReadString(spark, dir, mf, "lang", "zz").isEmpty)
  }

  test("pruned read over a clustered layout: few candidate files, identical result") {
    val dir = Files.createTempDirectory("zm_prune").toString + "/t"
    ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), numPartitions = 32)
      .write.parquet(dir)
    val mf = ZoneMap.build(spark, dir, Seq("l_partkey", "l_suppkey"))
    val all = spark.read.parquet(dir)
    val st = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    val (pLo, pHi) = (st.getLong(0), st.getLong(0) + (st.getLong(1) - st.getLong(0)) / 16)
    val (sLo, sHi) = (st.getLong(2), st.getLong(2) + (st.getLong(3) - st.getLong(2)) / 8)

    // the skip: a narrow range on EITHER clustered column keeps only a
    // small fraction of the 32 files as candidates
    val nFiles = all.inputFiles.length
    val pCand = ZoneMap.candidateFiles(mf, all.inputFiles.toSeq, "l_partkey",
      pLo.toDouble, pHi.toDouble)
    val sCand = ZoneMap.candidateFiles(mf, all.inputFiles.toSeq, "l_suppkey",
      sLo.toDouble, sHi.toDouble)
    assert(pCand.length < 0.4 * nFiles, s"partkey candidates ${pCand.length}/$nFiles")
    assert(sCand.length < 0.6 * nFiles, s"suppkey candidates ${sCand.length}/$nFiles")

    // the safety: pruned read == plain filtered read, exactly
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(canon(ZoneMap.prunedRead(spark, dir, mf, "l_partkey",
        pLo.toDouble, pHi.toDouble)) ==
      canon(all.filter(col("l_partkey") >= pLo && col("l_partkey") <= pHi)))
    assert(canon(ZoneMap.prunedRead(spark, dir, mf, "l_suppkey",
        sLo.toDouble, sHi.toDouble)) ==
      canon(all.filter(col("l_suppkey") >= sLo && col("l_suppkey") <= sHi)))
  }

  test("refresh is incremental: appended files footer-read, vanished files dropped, rest carried") {
    val dir = Files.createTempDirectory("zm_refresh").toString + "/t"
    li.filter(col("l_orderkey") % 2 === 0).repartition(6).write.parquet(dir)
    val mf0 = ZoneMap.build(spark, dir, Seq("l_partkey"))

    // append a batch → refresh reads ONLY the new footers
    li.filter(col("l_orderkey") % 2 === 1).repartition(3)
      .write.mode("append").parquet(dir)
    val (mf1, read1) = ZoneMap.refresh(spark, dir, mf0, Seq("l_partkey"))
    assert(read1 == 3L, s"expected 3 new footers, read $read1")
    // and the refreshed manifest equals a from-scratch build
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getLong(4))).toSet
    assert(canon(mf1) == canon(ZoneMap.build(spark, dir, Seq("l_partkey"))))

    // steady state: nothing new → zero footers read, manifest unchanged
    val (mf2, read2) = ZoneMap.refresh(spark, dir, mf1, Seq("l_partkey"))
    assert(read2 == 0L && canon(mf2) == canon(mf1))

    // compaction rewrites the layout → stale rows dropped, new read
    val tmp = Files.createTempDirectory("zm_refresh2").toString + "/t"
    spark.read.parquet(dir).repartition(2).write.parquet(tmp)
    val (mf3, read3) = ZoneMap.refresh(spark, tmp, mf1, Seq("l_partkey"))
    assert(read3 == 2L)
    assert(canon(mf3) == canon(ZoneMap.build(spark, tmp, Seq("l_partkey"))))
  }

  test("a column with no manifest stats never prunes; an empty candidate set reads nothing") {
    val dir = Files.createTempDirectory("zm_edge").toString + "/t"
    li.limit(1000).repartition(4).write.parquet(dir)
    val mf = ZoneMap.build(spark, dir, Seq("l_partkey"))
    val all = spark.read.parquet(dir)
    // l_quantity has no stats rows in this manifest → all files stay
    assert(ZoneMap.candidateFiles(mf, all.inputFiles.toSeq, "l_quantity",
      0, 1).length == all.inputFiles.length)
    // a range outside the domain prunes everything and yields 0 rows
    val none = ZoneMap.prunedRead(spark, dir, mf, "l_partkey", -100.0, -50.0)
    assert(none.count() == 0)
  }

  test("string manifest probes in unsigned UTF-8 order: supplementary-plane values are never over-pruned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zm_utf8").toString + "/t"
    // U+E000 (UTF-8 EE 80 80) vs U+1F600 (UTF-8 F0 9F 98 80):
    // UTF-16 code units order them 0xE000 > 0xD83D (surrogate), the
    // REVERSE of their byte order — a String-compared probe for
    // "x" against max="😀" would wrongly prune the file that
    // contains it
    val emoji = new String(Character.toChars(0x1F600))
    val pua = "x"
    Seq(pua, emoji).toDF("s").coalesce(1).write.parquet(dir)
    Seq("aaa", "zzz").toDF("s").coalesce(1).write.mode("append").parquet(dir)
    val mf = ZoneMap.buildString(spark, dir, Seq("s"))
    val all = spark.read.parquet(dir).inputFiles.toSeq
    val withPua = spark.read.parquet(dir)
      .filter(col("s") === pua)
      .select(input_file_name()).head().getString(0)
    val cand = ZoneMap.candidateFilesString(mf, all, "s", pua)
    assert(cand.contains(withPua),
      s"file holding $pua pruned — UTF-16 ordering leak")
    // the ascii-only file IS prunable for this probe
    assert(cand.length == 1, s"${cand.length} candidates")
    // end-to-end: the pruned equality read still finds the row
    val got = ZoneMap.prunedReadString(spark, dir, mf, "s", pua)
    assert(got.count() == 1)
  }

  test("INT64 bounds above 2^53 bracket the exact span: snowflake-id files are never over-pruned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zm_big").toString + "/t"
    // snowflake-style ids ~10^18: double spacing here is 128, so ids
    // base..base+9999 are mostly NOT double-representable and roughly
    // half of all per-file maxes round DOWN on a naive nearest cast
    val base = 1000000000000000000L
    (0 until 10000).map(i => (base + i, i % 97))
      .toDF("id", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.parquet(dir)
    val mf = ZoneMap.build(spark, dir, Seq("id"))
    val exact = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("mn"), max("id").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the test has teeth: at least one file's exact max rounds DOWN
    // (the naive toDouble bound would under-report its span)
    assert(exact.values.exists { case (_, mx) =>
      BigDecimal(mx.toDouble) < BigDecimal(mx) })
    var checked = 0
    mf.filter(col("column") === "id").collect().foreach { r =>
      val (mn, mx) = exact(r.getString(0))
      // soundness invariant: stored bounds CONTAIN the exact long span
      assert(BigDecimal(r.getDouble(2)) <= BigDecimal(mn),
        s"stored min ${r.getDouble(2)} above exact $mn")
      assert(BigDecimal(r.getDouble(3)) >= BigDecimal(mx),
        s"stored max ${r.getDouble(3)} below exact $mx")
      // and stay tight: within 2 ulps of the exact value
      assert(BigDecimal(mn) - BigDecimal(r.getDouble(2)) <= 256)
      assert(BigDecimal(r.getDouble(3)) - BigDecimal(mx) <= 256)
      checked += 1
    }
    assert(checked == 8)
    // a point probe one ulp past a rounded-down max must keep the file
    // that exactly contains the value (the naive bound dropped it)
    val all = spark.read.parquet(dir).inputFiles.toSeq
    exact.foreach { case (f, (_, mx)) =>
      if (BigDecimal(mx.toDouble) < BigDecimal(mx)) {
        val probe = Math.nextUp(mx.toDouble)
        assert(ZoneMap.candidateFiles(mf, all, "id", probe, probe).contains(f),
          s"file with exact max $mx pruned at probe $probe")
      }
    }
  }
}
