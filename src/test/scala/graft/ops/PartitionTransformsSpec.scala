package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PartitionTransformsSpec extends SparkSpec {

  import PartitionTransforms._

  private lazy val events = graft.Tables.events(spark, sf("events"))

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  private def fresh(transforms: Seq[Transform], df: DataFrame = events): String = {
    val dir = Files.createTempDirectory("pt").toString + "/t"
    PartitionTransforms.write(spark, df, dir, transforms)
    dir
  }

  test("scan hides the derived columns; round-trips the data exactly") {
    val dir = fresh(Seq(Days("ts"), Bucket(4, "user_id")))
    val got = PartitionTransforms.scan(spark, dir)
    assert(got.columns.toSeq == events.columns.toSeq)
    assert(same(got, events))
  }

  test("day-range scan opens only the admissible days; result is the exact filter") {
    val dir = fresh(Seq(Days("ts")))
    val bounds = events.agg(min("ts"), max("ts")).head()
    val lo = bounds.getTimestamp(0)
    val hi = new java.sql.Timestamp(lo.getTime + 2L * 86400 * 1000)
    val got = PartitionTransforms.scanRange(spark, dir, "ts", lo, hi)
    assert(same(got, events.filter(col("ts") >= lit(lo) && col("ts") <= lit(hi))))
    // ≤ 3 calendar days of files opened out of the full span
    val days = TxLog.liveEntries(spark, dir).map(_.name.split('/').head).distinct
    val opened = got.inputFiles.map(_.split('/').init.last).distinct
    assert(opened.length <= 3 && opened.length < days.length)
  }

  test("bucket equality scan opens O(|keys|) buckets via Spark's own hash") {
    val dir = fresh(Seq(Bucket(8, "user_id")))
    val keys: Seq[Any] = events.select("user_id").distinct()
      .limit(2).collect().map(_.getLong(0)).toSeq
    val (adm, total) = PartitionTransforms
      .pruneCountEquals(spark, dir, "user_id", keys)
    assert(total > adm && adm >= 1)
    val got = PartitionTransforms.scanEquals(spark, dir, "user_id", keys)
    assert(same(got, events.filter(col("user_id").isin(keys: _*))))
    // Int literals against the BIGINT column must still find the rows
    // (partition values are derived from the CAST literal)
    val intKeys: Seq[Any] = keys.map(k => Int.box(k.asInstanceOf[Long].toInt))
      .filter(k => k.asInstanceOf[Int].toLong == keys(
        keys.indexOf(k.asInstanceOf[Int].toLong)))
    if (intKeys.nonEmpty) {
      val viaInt = PartitionTransforms
        .scanEquals(spark, dir, "user_id", intKeys)
      assert(viaInt.count() ==
        events.filter(col("user_id").isin(intKeys: _*)).count())
    }
  }

  test("numeric truncate prunes ranges NUMERICALLY (string order would mis-prune)") {
    val df = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 3).as("v"))
    val dir = fresh(Seq(Truncate(40, "k")), df)
    // partitions 0,40,80,…,960: "120" < "80" lexicographically — the
    // numeric lte must keep 80..120
    val got = PartitionTransforms.scanRange(spark, dir, "k", 85L, 130L)
    assert(same(got, df.filter(col("k").between(85, 130))))
    val (adm, total) = (TxLog.liveEntries(spark, dir)
      .map(_.name.split('/').head).distinct.length, 25)
    assert(adm == total)
  }

  test("string truncate + months compose; unknown-column filters degrade to full scan") {
    val df = events.withColumn("etype", col("event_type"))
    val dir = fresh(Seq(Months("ts"), Truncate(2, "etype")), df)
    val got = PartitionTransforms.scanEquals(spark, dir, "etype", Seq("view"))
    assert(same(got, df.filter(col("etype") === "view")))
    // no transform over `value`: still correct, just unpruned
    val full = PartitionTransforms.scanEquals(spark, dir, "value", Seq(1.0))
    assert(full.count() == df.filter(col("value") === 1.0).count())
  }

  test("append lands one commit through the saved spec; bucket refuses ranges") {
    val dir = fresh(Seq(Days("ts"), Bucket(4, "user_id")))
    val v0 = TxLog.currentVersion(spark, dir)
    val extra = events.limit(50)
      .withColumn("ts", col("ts") + expr("INTERVAL 400 DAYS"))
    val v1 = PartitionTransforms.append(spark, extra, dir)
    assert(v1 == v0 + 1)
    assert(PartitionTransforms.scan(spark, dir).count() ==
      events.count() + 50)
    // the appended days are prunable like the originals
    val nlo = extra.agg(min("ts")).head().getTimestamp(0)
    val got = PartitionTransforms.scanRange(spark, dir, "ts", nlo,
      new java.sql.Timestamp(nlo.getTime + 86400L * 1000))
    assert(got.count() == PartitionTransforms.scan(spark, dir)
      .filter(col("ts") >= lit(nlo) &&
        col("ts") <= lit(new java.sql.Timestamp(nlo.getTime + 86400L * 1000)))
      .count())
    intercept[IllegalArgumentException] {
      PartitionTransforms.scanRange(spark, dir, "user_id", 0L, 10L)
    }
  }

  test("partition-spec evolution: old files keep their layout, each era prunes by its own transform") {
    // split events in two halves; era 1 = days(ts), era 2 = months(ts)
    val half1 = events.filter(pmod(col("event_id"), lit(2)) === 0)
    val half2 = events.filter(pmod(col("event_id"), lit(2)) === 1)
    val dir = fresh(Seq(Days("ts")), half1)
    val filesEra1 = TxLog.liveFiles(spark, dir).toSet
    PartitionTransforms.evolve(spark, dir, Seq(Months("ts")))
    PartitionTransforms.append(spark, half2, dir)
    // no rewrite: every era-1 file still live, new files months-laid
    assert(filesEra1.subsetOf(TxLog.liveFiles(spark, dir).toSet))
    assert(TxLog.liveFiles(spark, dir).exists(_.startsWith("p_months_ts=")))
    // full scan reassembles both eras exactly
    assert(same(PartitionTransforms.scan(spark, dir), events))
    // a range scan prunes BOTH eras and equals the exact filter
    val lo = events.agg(min("ts")).head().getTimestamp(0)
    val hi = new java.sql.Timestamp(lo.getTime + 2L * 86400 * 1000)
    val got = PartitionTransforms.scanRange(spark, dir, "ts", lo, hi)
    assert(same(got, events.filter(col("ts") >= lit(lo) && col("ts") <= lit(hi))))
    val (kept, total) = PartitionTransforms.pruneCountEquals(
      spark, dir, "ts", Seq(lo))
    assert(kept < total, s"evolution must still prune ($kept/$total)")
    // colliding parameter change refuses with the rewrite pointer
    val bdir = fresh(Seq(Bucket(4, "user_id")))
    val e = intercept[IllegalArgumentException] {
      PartitionTransforms.evolve(spark, bdir, Seq(Bucket(8, "user_id")))
    }
    assert(e.getMessage.contains("rewrite"))
    // evolving bucket -> days keeps ranges refusing only while no
    // order-preserving era exists, then prunes the days era
    // (via the SQL procedure — same entry point a warehouse user has)
    graft.GraftExtensions.installInto(spark)
    val r = spark.sql(
      s"SELECT * FROM graft_evolve_partitioning('$bdir', 'days:ts')").head()
    assert(r.getString(0) == "evolve-partitioning")
    PartitionTransforms.append(spark, half2, bdir)
    val rgot = PartitionTransforms.scanRange(spark, bdir, "ts", lo, hi)
    assert(same(rgot, events.unionByName(half2)
      .filter(col("ts") >= lit(lo) && col("ts") <= lit(hi))))
  }

  test("evolution composes with deletion vectors and with branches") {
    // DV on an era-1 file, evolve, append era 2: the mixed-era pruned
    // read must still hide the vectored rows (eraScans reads through
    // the shared DV-applying reader)
    val half1 = events.filter(pmod(col("event_id"), lit(2)) === 0)
    val half2 = events.filter(pmod(col("event_id"), lit(2)) === 1)
    val dir = fresh(Seq(Days("ts")), half1)
    val victim = half1.select("event_id").head().getLong(0)
    DeletionVectors.delete(spark, dir, col("event_id") === victim)
    PartitionTransforms.evolve(spark, dir, Seq(Months("ts")))
    PartitionTransforms.append(spark, half2, dir)
    val want = events.filter(col("event_id") =!= victim)
    assert(same(PartitionTransforms.scan(spark, dir), want))

    // hidden-partition append on a BRANCH: invisible to main, the
    // branch's pruned read sees it, publish lands it
    TxLog.createBranch(spark, dir, "wip")
    val extra = half2.limit(50).withColumn("event_id",
      col("event_id") + 10000000L)
    TxLog.withBranch(spark, dir, "wip") {
      PartitionTransforms.append(spark, extra, dir)
      assert(PartitionTransforms.scan(spark, dir).count() ==
        want.count() + 50)
    }
    assert(PartitionTransforms.scan(spark, dir).count() == want.count())
    TxLog.publishBranch(spark, dir, "wip")
    assert(PartitionTransforms.scan(spark, dir).count() == want.count() + 50)
  }

  test("deletion vectors compose with hidden-partition pruning") {
    val dir = fresh(Seq(Bucket(4, "user_id")))
    val key = events.select("user_id").head().getLong(0)
    DeletionVectors.delete(spark, dir,
      col("user_id") === key && col("event_type") === "view")
    val got = PartitionTransforms.scanEquals(spark, dir, "user_id", Seq(key))
    assert(same(got, events.filter(
      col("user_id") === key && col("event_type") =!= "view")))
  }
}
