package graft.ops

import java.nio.file.Files

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

/** Named tags ([[TxLog.setTag]]) + the procedure TVFs
  * (graft_tag / graft_optimize / graft_vacuum / graft_restore /
  * graft_checkpoint).
  */
class TagsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.installInto(spark)

  private def table(n: Int = 3): String = {
    val dir = Files.createTempDirectory("tags").toString + "/t"
    (0 until n).foreach { i =>
      if (i == 0) {
        Seq((i.toLong, s"v$i")).toDF("k", "v").write.parquet(dir)
        TxLog.convert(spark, dir)
      } else UpsertWhere.byKeys(spark, dir, "k",
        Seq((i.toLong, s"v$i")).toDF("k", "v"))
    }
    dir
  }

  test("a tag names a version; re-tag moves it; delete forgets it") {
    val dir = table()
    TxLog.setTag(spark, dir, "audit", 1)
    assert(TxLog.tags(spark, dir) == Map("audit" -> 1))
    assert(TxLog.snapshotTag(spark, dir, "audit").count() ==
      TxLog.snapshot(spark, dir, 1).count())
    TxLog.setTag(spark, dir, "audit") // current
    assert(TxLog.tags(spark, dir)("audit") == TxLog.currentVersion(spark, dir))
    TxLog.deleteTag(spark, dir, "audit")
    assert(TxLog.tags(spark, dir).isEmpty)
    intercept[IllegalArgumentException] {
      TxLog.snapshotTag(spark, dir, "audit")
    }
    intercept[IllegalArgumentException] {
      TxLog.setTag(spark, dir, "ghost", 99) // version must exist
    }
  }

  test("vacuum keeps a tagged version reconstructable past the retention count") {
    val dir = table(1)
    TxLog.setTag(spark, dir, "pinned", 0)
    val taggedRows = TxLog.snapshot(spark, dir, 0).collect().toSet
    // churn far past any retention: each upsert rewrites the file
    (1 to 6).foreach { i =>
      UpsertWhere.byKeys(spark, dir, "k", Seq((0L, s"w$i")).toDF("k", "v"))
    }
    val reclaimed = TxLog.vacuum(spark, dir, retainVersions = 2)
    // the tagged version still reads bit-identically (files AND log)
    assert(TxLog.snapshotTag(spark, dir, "pinned").collect().toSet == taggedRows)
    // an untagged far-past version is NOT reconstructable
    intercept[Exception] { TxLog.snapshot(spark, dir, 2).collect() }
    // dropping the tag releases it: the next vacuum reclaims
    TxLog.deleteTag(spark, dir, "pinned")
    TxLog.vacuum(spark, dir, retainVersions = 2)
    intercept[Exception] { TxLog.snapshot(spark, dir, 0).collect() }
    assert(reclaimed >= 0)
  }

  test("procedure TVFs: tag + snapshot-by-tag + restore + vacuum + checkpoint from pure SQL") {
    val dir = table()
    val v1Rows = TxLog.snapshot(spark, dir, 1).collect().toSet
    val tagged = spark.sql(s"SELECT * FROM graft_tag('$dir', 'rc-1', 1)").head()
    assert(tagged.getString(0) == "tag" && tagged.getLong(2) == 1L)
    assert(spark.sql(s"SELECT * FROM graft_snapshot('$dir', 'rc-1')")
      .collect().toSet == v1Rows)
    // integer second arg still means a version number
    assert(spark.sql(s"SELECT * FROM graft_snapshot('$dir', 1)")
      .collect().toSet == v1Rows)
    val restored = spark.sql(s"SELECT * FROM graft_restore('$dir', 1)").head()
    assert(restored.getString(0) == "restore")
    assert(TxLog.snapshot(spark, dir).collect().toSet == v1Rows)
    val cp = spark.sql(s"SELECT * FROM graft_checkpoint('$dir')").head()
    assert(cp.getString(0) == "checkpoint")
    val vac = spark.sql(s"SELECT * FROM graft_vacuum('$dir', 2)").head()
    assert(vac.getString(0) == "vacuum" && vac.getLong(2) >= 0)
  }

  test("TIMESTAMP AS OF: snapshotAsOf resolves by commit wall-clock, SQL takes a timestamp literal") {
    val dir = table(1) // v0 only
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    UpsertWhere.byKeys(spark, dir, "k", Seq((0L, "late")).toDF("k", "v")) // v1
    assert(TxLog.versionAsOf(spark, dir, between) == 0)
    assert(TxLog.versionAsOf(spark, dir, System.currentTimeMillis()) == 1)
    assert(TxLog.snapshotAsOf(spark, dir, between).collect().toSet ==
      TxLog.snapshot(spark, dir, 0).collect().toSet)
    // before the table existed → error naming the earliest commit
    intercept[IllegalArgumentException] { TxLog.versionAsOf(spark, dir, 0L) }
    // SQL: a TIMESTAMP literal second argument means AS OF
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone(
      spark.conf.get("spark.sql.session.timeZone")))
    val lit = fmt.format(new java.util.Date(between))
    assert(spark.sql(
      s"SELECT * FROM graft_snapshot('$dir', TIMESTAMP '$lit')")
      .collect().toSet == TxLog.snapshot(spark, dir, 0).collect().toSet)
  }

  test("in-commit timestamps: AS OF survives mtime-scrambling log copies; stamps are monotonic") {
    val dir = table(1) // v0
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    UpsertWhere.byKeys(spark, dir, "k", Seq((0L, "late")).toDF("k", "v")) // v1
    // a migration (rsync/DistCp/object-store copy) rewrites mtimes —
    // scramble them INVERTED; the in-commit stamp must still order
    val fs = Compact.fsOf(spark, dir)
    val log = new org.apache.hadoop.fs.Path(dir, "_txlog")
    val now = System.currentTimeMillis()
    fs.listStatus(log).filter(_.getPath.getName.matches("v\\d{8}\\.txt"))
      .foreach { st =>
        val v = st.getPath.getName.substring(1, 9).toInt
        fs.setTimes(st.getPath, now - v * 3600L * 1000, -1) // newer v = OLDER mtime
      }
    assert(TxLog.versionAsOf(spark, dir, between) == 0)
    assert(TxLog.versionAsOf(spark, dir, System.currentTimeMillis()) == 1)
    // stamps are strictly increasing even when commits land within
    // one clock tick (the max(now, parent+1) rule)
    assert(TxLog.commitTimeMillis(spark, dir, 1) >
      TxLog.commitTimeMillis(spark, dir, 0))
    // history exposes the stamp, newest first
    val ts = TxLog.history(spark, dir).select("ts").collect()
      .map(_.getTimestamp(0).getTime).toSeq
    assert(ts == ts.sorted.reverse && ts.distinct.size == ts.size)
  }

  test("pre-stamp commits in a copied log: AS OF degrades to the order-insensitive scan") {
    val dir = table(4) // v0..v3, all stamped
    val fs = Compact.fsOf(spark, dir)
    val log = new org.apache.hadoop.fs.Path(dir, "_txlog")
    // simulate LEGACY history that was later rsync'd: strip the
    // in-commit stamp from v0/v1 (pre-stamp commits) and reset their
    // mtimes to the copy time — LATER than v2/v3's stamps, so the
    // retained range's times are NOT monotonic and a binary search
    // over them answers a wrong floor (here -1: both midpoint probes
    // land on the reset prefix)
    Seq(0, 1).foreach { v =>
      val p = new org.apache.hadoop.fs.Path(log, f"v$v%08d.txt")
      val in = fs.open(p)
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filterNot(_.startsWith("TS ")).mkString("\n")
        finally in.close()
      val out = fs.create(p, true)
      out.write(body.getBytes("UTF-8")); out.close()
      fs.setTimes(p, System.currentTimeMillis() + 3600L * 1000, -1)
    }
    val t2 = TxLog.commitTimeMillis(spark, dir, 2)
    val t3 = TxLog.commitTimeMillis(spark, dir, 3)
    assert(TxLog.versionAsOf(spark, dir, t2) == 2)
    assert(TxLog.versionAsOf(spark, dir, t3) == 3)
    // and a ts past everything still answers the newest version
    assert(TxLog.versionAsOf(spark, dir,
      System.currentTimeMillis() + 7200L * 1000) == 3)
  }

  test("auto-checkpoint policy: every N-th commit folds the log in-line") {
    GraftExtensions.installInto(spark)
    val dir = table(1) // v0 only
    spark.sql(s"SELECT * FROM graft_checkpoint_every('$dir', 2)").collect()
    val fs = Compact.fsOf(spark, dir)
    def cps: Seq[String] = fs.listStatus(
        new org.apache.hadoop.fs.Path(dir, "_txlog")).toSeq
      .map(_.getPath.getName).filter(_.matches("c\\d{8}\\.txt")).sorted
    (1 to 4).foreach { i =>
      UpsertWhere.byKeys(spark, dir, "k",
        Seq((0L, s"u$i")).toDF("k", "v")) // v1..v4
    }
    assert(cps == Seq("c00000002.txt", "c00000004.txt"))
    // clearing stops the cadence; reads stay correct throughout
    spark.sql(s"SELECT * FROM graft_checkpoint_every('$dir', 0)").collect()
    UpsertWhere.byKeys(spark, dir, "k", Seq((0L, "u5")).toDF("k", "v")) // v5
    UpsertWhere.byKeys(spark, dir, "k", Seq((0L, "u6")).toDF("k", "v")) // v6
    assert(cps == Seq("c00000002.txt", "c00000004.txt"))
    assert(TxLog.snapshot(spark, dir).filter(col("k") === 0)
      .head().getString(1) == "u6")
    // the policy travels with a clone
    TxLog.setCheckpointEvery(spark, dir, 3)
    val dst = java.nio.file.Files
      .createTempDirectory("ckev_clone").toString + "/c"
    TxLog.cloneTo(spark, dir, dst)
    assert(TxLog.checkpointEvery(spark, dst).contains(3))
  }

  test("graft_detail: one-row operational summary reflects declarations and features") {
    GraftExtensions.installInto(spark)
    val dir = table(2)
    TxLog.setClusterColumns(spark, dir, Seq("k"))
    TxLog.setStatsColumns(spark, dir, Seq("k"))
    TxLog.setTag(spark, dir, "rc")
    val r = spark.sql(s"SELECT * FROM graft_detail('$dir')").head()
    assert(r.getAs[String]("location") == dir)
    assert(r.getAs[Int]("version") == TxLog.currentVersion(spark, dir))
    assert(r.getAs[Long]("n_files") == TxLog.liveEntries(spark, dir).size)
    assert(r.getAs[Long]("size_bytes") > 0)
    assert(r.getAs[String]("cluster_columns") == "k")
    assert(r.getAs[String]("stats_columns") == "k")
    assert(!r.getAs[Boolean]("row_tracking"))
    assert(r.getAs[Long]("n_tags") == 1)
    assert(r.getAs[String]("clone_source") == "")
    assert(r.getAs[java.sql.Timestamp]("committed_at").getTime ==
      TxLog.commitTimeMillis(spark, dir, TxLog.currentVersion(spark, dir)))
  }

  test("pre-stamp history: a commit without TS falls back to its file mtime") {
    val dir = table(1)
    val fs = Compact.fsOf(spark, dir)
    val v0 = new org.apache.hadoop.fs.Path(dir, "_txlog/v00000000.txt")
    // rewrite v0 as an old-format commit (no TS line)
    val body = {
      val in = fs.open(v0)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filterNot(_.startsWith("TS ")).mkString("\n")
      finally in.close()
    }
    val out = fs.create(v0, true)
    out.write(body.getBytes("UTF-8")); out.close()
    val stamp = 1500000000000L // a fixed past instant
    fs.setTimes(v0, stamp, -1)
    assert(TxLog.commitTimeMillis(spark, dir, 0) == stamp)
    assert(TxLog.versionAsOf(spark, dir, stamp) == 0)
  }

  test("graft_optimize procedure bin-packs the small-file tail and reports it") {
    val dir = Files.createTempDirectory("tags").toString + "/t"
    Seq((0L, "a")).toDF("k", "v").write.parquet(dir)
    TxLog.convert(spark, dir)
    (1 to 5).foreach(i => TxLog.append(spark, dir,
      Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val before = TxLog.liveFiles(spark, dir).length
    val r = spark.sql(s"SELECT * FROM graft_optimize('$dir')").head()
    assert(r.getString(0) == "optimize")
    assert(r.getLong(3) > 0, s"expected packed files, got $r") // packed_files
    assert(TxLog.liveFiles(spark, dir).length < before)
    assert(TxLog.snapshot(spark, dir).count() == 6)
  }
}
