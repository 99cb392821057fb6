package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COPY INTO ([[CopyInto]]): ledger-tracked idempotent ingestion —
  * first-load completeness, re-run no-op, incremental file pickup,
  * FORCE duplication, pattern scoping, the crash-window rule (a shard
  * without its commit is invalid), constraint refusal leaving the
  * ledger clean, and identity assignment on feeds that omit the id.
  */
class CopyIntoSpec extends SparkSpec {

  private lazy val nation = graft.Tables.nation(spark, sf("nation"))

  private def same(got: DataFrame, expected: DataFrame): Boolean =
    got.select(expected.columns.map(col): _*).exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select(expected.columns.map(col): _*)).isEmpty

  /** Fresh empty TxLog table pinned to `schema`. */
  private def freshTable(schema: org.apache.spark.sql.types.StructType)
      : String = {
    val dir = Files.createTempDirectory("copyinto_tbl").toString + "/t"
    TxLog.convert(spark, dir)
    TxLog.setTableSchema(spark, dir, schema, 0)
    dir
  }

  /** CSV landing zone holding `df` (header mode), ≥`parts` files. */
  private def landingZone(df: DataFrame, parts: Int): String = {
    val src = Files.createTempDirectory("copyinto_src").toString + "/in"
    df.repartition(parts).write.option("header", "true").csv(src)
    src
  }

  private val csvOpts = Map("header" -> "true")

  test("first load ingests everything; re-run is a recorded no-op") {
    val src = landingZone(nation, 3)
    val dir = freshTable(nation.schema)
    val r1 = CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
    assert(r1.filesLoaded == 3 && r1.filesSkipped == 0)
    assert(r1.rowsLoaded == nation.count())
    assert(same(TxLog.snapshot(spark, dir), nation))
    val v1 = TxLog.currentVersion(spark, dir)
    val r2 = CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
    assert(r2.filesLoaded == 0 && r2.filesSkipped == 3)
    assert(r2.version == v1) // nothing committed
    assert(same(TxLog.snapshot(spark, dir), nation))
  }

  test("incremental: only files new since the last load ingest") {
    val below = nation.filter(col("n_nationkey") < 10)
    val above = nation.filter(col("n_nationkey") >= 10)
    val src = landingZone(below, 2)
    val dir = freshTable(nation.schema)
    assert(CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
      .filesLoaded == 2)
    // two more files land in the zone; only they load
    above.repartition(2).write.option("header", "true")
      .mode("append").csv(src)
    val r = CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
    assert(r.filesLoaded == 2 && r.filesSkipped == 2)
    assert(r.rowsLoaded == above.count())
    assert(same(TxLog.snapshot(spark, dir), nation))
    // and the registry knows all four
    assert(CopyInto.ingestedFiles(spark, dir).size == 4)
  }

  test("force re-loads (appending duplicates) and still records") {
    val src = landingZone(nation, 2)
    val dir = freshTable(nation.schema)
    CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
    val rf = CopyInto.copyInto(spark, dir, src, "csv", csvOpts,
      force = true)
    assert(rf.filesLoaded == 2)
    assert(same(TxLog.snapshot(spark, dir), nation.unionAll(nation)))
    // forced files are recorded: a later normal run skips them
    val r3 = CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
    assert(r3.filesLoaded == 0 && r3.filesSkipped == 2)
  }

  test("pattern scopes the candidate listing") {
    val src = landingZone(nation, 2)
    val fs = Compact.fsOf(spark, src)
    // a non-matching sibling (e.g. a manifest the producer drops)
    val out = fs.create(new org.apache.hadoop.fs.Path(src, "notes.json"))
    out.write("{}".getBytes("UTF-8")); out.close()
    val dir = freshTable(nation.schema)
    val r = CopyInto.copyInto(spark, dir, src, "csv", csvOpts,
      pattern = "*.csv")
    assert(r.filesLoaded == 2)
    assert(same(TxLog.snapshot(spark, dir), nation))
  }

  test("crash window: a ledger shard whose txn never committed is invalid") {
    val src = landingZone(nation, 2)
    val dir = freshTable(nation.schema)
    // simulate a load that died after writing its shard: claim BOTH
    // source files under a txn that never commits
    val fs = Compact.fsOf(spark, src)
    val claimed = fs.globStatus(new org.apache.hadoop.fs.Path(src, "*.csv"))
      .map(st => fs.makeQualified(st.getPath).toString).sorted
    TxLog.metaWrite(spark, dir, "ingest.dead-load.txt",
      claimed.mkString("\n"))
    assert(CopyInto.ingestedFiles(spark, dir).isEmpty) // invalid shard
    val r = CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
    assert(r.filesLoaded == 2) // nothing lost to the dead shard
    assert(same(TxLog.snapshot(spark, dir), nation))
  }

  test("CHECK violation refuses before anything is recorded") {
    val src = landingZone(nation, 2)
    val dir = freshTable(nation.schema)
    TxLog.setCheckConstraints(spark, dir, Seq("n_nationkey < 10"))
    intercept[Exception] {
      CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
    }
    assert(CopyInto.ingestedFiles(spark, dir).isEmpty)
    assert(TxLog.snapshot(spark, dir).count() == 0)
    // fixing the table lets the SAME files load
    TxLog.setCheckConstraints(spark, dir, Nil)
    assert(CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
      .filesLoaded == 2)
    assert(same(TxLog.snapshot(spark, dir), nation))
  }

  test("GENERATED ALWAYS identity: a feed omitting the id assigns fresh") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("n_name", StringType)))
    val dir = freshTable(schema)
    IdentityColumns.declare(spark, dir, "id")
    // the landing zone spells ONLY the payload column; the schema-
    // driven read materializes `id` as all-NULL = the omitted shape
    val src = landingZone(nation.select(col("n_name")), 2)
    val r = CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
    assert(r.filesLoaded == 2)
    val got = TxLog.snapshot(spark, dir)
    assert(got.count() == nation.count())
    assert(got.select("id").distinct().count() == nation.count())
    assert(got.agg(sum(when(col("id").isNull, 1).otherwise(0)))
      .head().getLong(0) == 0)
    // and the payload landed by NAME, not shifted into the id slot
    assert(got.select("n_name").exceptAll(nation.select("n_name")).isEmpty)
  }

  test("csv header mode maps by NAME: reordered and narrower feeds land correctly") {
    val dir = freshTable(nation.schema)
    // feed spells the columns REORDERED vs the pin — positional
    // mapping would shift every value; name mapping must not
    val src = Files.createTempDirectory("copyinto_hdr").toString + "/in"
    nation.select("n_name", "n_regionkey", "n_nationkey")
      .repartition(1).write.option("header", "true").csv(src)
    CopyInto.copyInto(spark, dir, src, "csv", csvOpts)
    assert(same(TxLog.snapshot(spark, dir), nation))
    // a narrower feed (key + name only) NULL-fills the omitted column
    val dir2 = freshTable(nation.schema)
    val src2 = Files.createTempDirectory("copyinto_hdr2").toString + "/in"
    nation.select("n_nationkey", "n_name")
      .repartition(1).write.option("header", "true").csv(src2)
    CopyInto.copyInto(spark, dir2, src2, "csv", csvOpts)
    val got = TxLog.snapshot(spark, dir2)
    assert(same(got.select("n_nationkey", "n_name"),
      nation.select("n_nationkey", "n_name")))
    assert(got.filter(col("n_regionkey").isNotNull).count() == 0)
    // an unknown header column refuses (csv cannot evolve)
    val src3 = Files.createTempDirectory("copyinto_hdr3").toString + "/in"
    nation.withColumn("bogus", lit(1)).repartition(1)
      .write.option("header", "true").csv(src3)
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, dir2, src3, "csv", csvOpts)
    }
    assert(e.getMessage.contains("bogus"))
    // evolveSchema on csv refuses up front (fresh table — an
    // already-ingested source would no-op before the check)
    intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, freshTable(nation.schema), src2, "csv",
        csvOpts, evolveSchema = true)
    }
  }

  test("csv header mode: ONE batch mixing header orders groups per header, no value shift") {
    // two producers land files with DIFFERENT column orders in the
    // same wave — a single positional schema (inferred from whichever
    // file lists first) would silently shift the other file's values;
    // the per-header grouping must land both correctly in one load
    val dir = freshTable(nation.schema)
    val zone = Files.createTempDirectory("copyinto_mix").toString + "/in"
    val zfs = Compact.fsOf(spark, zone)
    zfs.mkdirs(new org.apache.hadoop.fs.Path(zone))
    def landAs(df: DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("copyinto_mix_part").toString + "/w"
      df.repartition(1).write.option("header", "true").csv(tmp)
      val part = zfs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      assert(zfs.rename(part, new org.apache.hadoop.fs.Path(zone, name)))
    }
    val below = nation.filter(col("n_nationkey") < 10)
    val above = nation.filter(col("n_nationkey") >= 10)
    landAs(below.select("n_name", "n_nationkey", "n_regionkey"),
      "a_producer1.csv")
    landAs(above.select("n_regionkey", "n_nationkey", "n_name"),
      "b_producer2.csv")
    val r = CopyInto.copyInto(spark, dir, zone, "csv", csvOpts)
    assert(r.filesLoaded == 2)
    assert(same(TxLog.snapshot(spark, dir), nation))
    // one bad header among good ones refuses naming the FILE
    landAs(below.limit(1).withColumn("bogus", lit(1)), "c_bad.csv")
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, dir, zone, "csv", csvOpts)
    }
    assert(e.getMessage.contains("bogus") &&
      e.getMessage.contains("c_bad.csv"))
  }

  test("parquet schema evolution: batch-only columns widen with evolveSchema") {
    val dir = freshTable(nation.schema)
    val src = Files.createTempDirectory("copyinto_ev").toString + "/in"
    nation.withColumn("extra", col("n_nationkey") * 10)
      .repartition(2).write.parquet(src)
    // without the flag: refusal names the new column
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, dir, src, "parquet")
    }
    assert(e.getMessage.contains("extra"))
    assert(CopyInto.ingestedFiles(spark, dir).isEmpty)
    val r = CopyInto.copyInto(spark, dir, src, "parquet",
      evolveSchema = true)
    assert(r.filesLoaded == 2)
    val got = TxLog.snapshot(spark, dir)
    assert(got.columns.contains("extra"))
    assert(got.filter(col("extra") =!= col("n_nationkey") * 10).count() == 0)
    // a narrower later batch NULL-fills the evolved column
    val src2 = Files.createTempDirectory("copyinto_ev2").toString + "/in"
    nation.filter(col("n_nationkey") < 3)
      .withColumn("n_nationkey", col("n_nationkey") + 1000)
      .repartition(1).write.parquet(src2)
    CopyInto.copyInto(spark, dir, src2, "parquet")
    val late = TxLog.snapshot(spark, dir)
      .filter(col("n_nationkey") >= 1000)
    assert(late.count() == 3 &&
      late.filter(col("extra").isNotNull).count() == 0)
  }

  test("zero-byte files in a header-mode batch ingest as nothing, not a failure") {
    val dir = freshTable(nation.schema)
    val zone = landingZone(nation, 2)
    val zfs = Compact.fsOf(spark, zone)
    // a producer's empty flush lands beside real files
    zfs.create(new org.apache.hadoop.fs.Path(zone, "a_empty.csv")).close()
    val r = CopyInto.copyInto(spark, dir, zone, "csv", csvOpts)
    assert(r.filesLoaded == 3 && r.rowsLoaded == nation.count())
    assert(same(TxLog.snapshot(spark, dir), nation))
    // the empty file entered the ledger: a re-run re-lists nothing
    val r2 = CopyInto.copyInto(spark, dir, zone, "csv", csvOpts)
    assert(r2.filesLoaded == 0 && r2.filesSkipped == 3)
    // a batch that is ONLY empty files commits an empty load cleanly
    val dir2 = freshTable(nation.schema)
    val zone2 = Files.createTempDirectory("copyinto_allempty")
      .toString + "/in"
    zfs.mkdirs(new org.apache.hadoop.fs.Path(zone2))
    zfs.create(new org.apache.hadoop.fs.Path(zone2, "e1.csv")).close()
    val r3 = CopyInto.copyInto(spark, dir2, zone2, "csv", csvOpts)
    assert(r3.filesLoaded == 1 && r3.rowsLoaded == 0L)
    assert(CopyInto.copyInto(spark, dir2, zone2, "csv", csvOpts)
      .filesLoaded == 0)
  }

  test("racing loaders: disjoint patterns split a zone; the same pattern never double-loads") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // disjoint patterns, truly concurrent: each loader ingests its
    // half, union is exactly the source
    val below = nation.filter(col("n_nationkey") < 10)
    val above = nation.filter(col("n_nationkey") >= 10)
    val zone = Files.createTempDirectory("copyinto_race").toString + "/in"
    below.repartition(1).write.option("header", "true")
      .csv(zone + "/a")
    above.repartition(1).write.option("header", "true")
      .csv(zone + "/b")
    val zfs = Compact.fsOf(spark, zone)
    Seq("a", "b").foreach { sub =>
      zfs.listStatus(new org.apache.hadoop.fs.Path(s"$zone/$sub"))
        .filter(_.getPath.getName.startsWith("part-")).foreach { st =>
          zfs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(zone, s"${sub}_${st.getPath.getName}"))
        }
      zfs.delete(new org.apache.hadoop.fs.Path(s"$zone/$sub"), true)
    }
    val dir = freshTable(nation.schema)
    val r = Await.result(Future.sequence(Seq(
      Future(CopyInto.copyInto(spark, dir, zone, "csv", csvOpts, "a_*")),
      Future(CopyInto.copyInto(spark, dir, zone, "csv", csvOpts, "b_*")))),
      5.minutes)
    assert(r.map(_.filesLoaded).sum == 2)
    assert(same(TxLog.snapshot(spark, dir), nation))
    // SAME pattern, N concurrent loaders: the claim handshake splits
    // the files — every file lands exactly once across all loaders
    val dir2 = freshTable(nation.schema)
    val zone2 = landingZone(nation, 4)
    val rs = Await.result(Future.sequence((1 to 4).map(_ =>
      Future(CopyInto.copyInto(spark, dir2, zone2, "csv", csvOpts)))),
      5.minutes)
    assert(rs.map(_.filesLoaded).sum == 4,
      s"expected 4 files loaded once across loaders, got ${rs.map(_.filesLoaded)}")
    assert(same(TxLog.snapshot(spark, dir2), nation))
    // and a follow-up run sees nothing fresh (claims were released)
    val after = CopyInto.copyInto(spark, dir2, zone2, "csv", csvOpts)
    assert(after.filesLoaded == 0 && after.filesSkipped == 4)
    // a STALE claim (crashed loader) is stolen after its lease: plant
    // one by hand against a new file, then load with a tiny lease
    nation.limit(2).repartition(1).write.option("header", "true")
      .mode("append").csv(zone2)
    val freshFile = Compact.fsOf(spark, zone2)
      .globStatus(new org.apache.hadoop.fs.Path(zone2, "*"))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => Compact.fsOf(spark, zone2).makeQualified(st.getPath).toString)
      .filterNot(CopyInto.ingestedFiles(spark, dir2).toSet).head
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val digest = md.digest(freshFile.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    TxLog.metaWrite(spark, dir2, s"claim.$digest.txt",
      s"${java.util.UUID.randomUUID}\n${System.currentTimeMillis() - 10000}")
    // liveness is the claim FILE's age on the filesystem's own clock
    // (clock-skew-proof) — backdate its mtime to simulate the crash
    Compact.fsOf(spark, dir2).setTimes(
      new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(dir2, "_txlog"), s"claim.$digest.txt"),
      System.currentTimeMillis() - 10000, -1)
    // within the lease: the planted claim holds, nothing loads
    val held = CopyInto.copyInto(spark, dir2, zone2, "csv", csvOpts,
      claimLeaseMs = 60000L)
    assert(held.filesLoaded == 0)
    // past the lease: stolen and loaded
    val stolen = CopyInto.copyInto(spark, dir2, zone2, "csv", csvOpts,
      claimLeaseMs = 1000L)
    assert(stolen.filesLoaded == 1)
  }

  test("per-prefix loading: a many-prefix zone ingests exactly once, one bounded listing at a time") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // 6 dated prefixes + stray top-level files — the shape a zone too
    // large for one driver-side glob is partitioned into
    val root = Files.createTempDirectory("copyinto_pfx").toString + "/zone"
    val slices = (0 until 6).map { i =>
      val df = nation.filter(col("n_nationkey") % 6 === i)
      df.repartition(2).write.option("header", "true")
        .csv(s"$root/day=2026-08-1$i")
      df
    }
    val stray = nation.limit(3)
      .withColumn("n_nationkey", col("n_nationkey") + 100)
    stray.repartition(1).write.option("header", "true")
      .mode("append").csv(root) // lands part files at the top level
    val expected = slices.reduce(_ unionByName _).unionByName(stray)
    val dir = freshTable(nation.schema)
    val r1 = CopyInto.copyIntoByPrefix(spark, dir, root, "csv", csvOpts)
    assert(r1.filesLoaded >= 13, s"got ${r1.filesLoaded}") // 6×2 + stray
    assert(same(TxLog.snapshot(spark, dir), expected))
    // one commit PER NON-EMPTY PREFIX (+1 for the top-level files):
    // the driver never built a zone-wide batch
    val ops = TxLog.history(spark, dir)
      .filter(col("operation").startsWith("copy-into")).count()
    assert(ops == 7L, s"expected 7 per-prefix commits, got $ops")
    // re-run: the ledger remembers everything, nothing new commits
    val r2 = CopyInto.copyIntoByPrefix(spark, dir, root, "csv", csvOpts)
    assert(r2.filesLoaded == 0)
    assert(same(TxLog.snapshot(spark, dir), expected))
    // racing loaders over the same zone: prefixes split via claims,
    // every file lands exactly once across all of them
    val dir2 = freshTable(nation.schema)
    val rs = Await.result(Future.sequence((1 to 3).map(_ => Future(
      CopyInto.copyIntoByPrefix(spark, dir2, root, "csv", csvOpts)))),
      5.minutes)
    assert(rs.map(_.filesLoaded).sum == r1.filesLoaded,
      s"expected ${r1.filesLoaded} loaded once across loaders, " +
        s"got ${rs.map(_.filesLoaded)}")
    assert(same(TxLog.snapshot(spark, dir2), expected))
  }

  test("per-prefix loading recurses into nested zones instead of silently loading nothing") {
    // day=X/hour=Y/part.csv — nested one level deeper than the
    // loader's first-level prefix walk expects
    val root = Files.createTempDirectory("copyinto_nest").toString + "/zone"
    val slices = (0 until 4).map { i =>
      val df = nation.filter(col("n_nationkey") % 4 === i)
      df.repartition(1).write.option("header", "true")
        .csv(s"$root/day=2026-08-1${i / 2}/hour=${i % 2}")
      df
    }
    // one MIXED prefix: direct files AND a nested hour dir
    val extra = nation.limit(2)
      .withColumn("n_nationkey", col("n_nationkey") + 200)
    extra.repartition(1).write.option("header", "true")
      .csv(s"$root/day=2026-08-12")
    val extra2 = nation.limit(2)
      .withColumn("n_nationkey", col("n_nationkey") + 300)
    extra2.repartition(1).write.option("header", "true")
      .csv(s"$root/day=2026-08-12/hour=5")
    val expected = (slices :+ extra :+ extra2).reduce(_ unionByName _)
    val dir = freshTable(nation.schema)
    val r = CopyInto.copyIntoByPrefix(spark, dir, root, "csv", csvOpts)
    assert(r.filesLoaded == 6, s"got ${r.filesLoaded}")
    assert(same(TxLog.snapshot(spark, dir), expected))
    // replay stays a no-op through the recursion
    assert(CopyInto.copyIntoByPrefix(spark, dir, root, "csv", csvOpts)
      .filesLoaded == 0)
    assert(same(TxLog.snapshot(spark, dir), expected))
  }

  test("unsupported format and unmanaged target refuse with the reason") {
    val src = landingZone(nation, 1)
    val dir = freshTable(nation.schema)
    intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, dir, src, "avro")
    }
    intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark,
        Files.createTempDirectory("not_managed").toString, src, "csv")
    }
  }

  test("SQL surface: graft_copy_into / graft_ingested") {
    graft.GraftExtensions.installInto(spark)
    val src = landingZone(nation, 2)
    val dir = freshTable(nation.schema)
    // csv options aren't expressible through the TVF (header default
    // false) — use a headerless zone for the SQL path
    val src2 = Files.createTempDirectory("copyinto_sql").toString + "/in"
    nation.repartition(2).write.csv(src2)
    val r = spark.sql(
      s"SELECT * FROM graft_copy_into('$dir', '$src2', 'csv')").head()
    assert(r.getAs[Long]("files_loaded") == 2)
    assert(r.getAs[Long]("rows_loaded") == nation.count())
    assert(same(TxLog.snapshot(spark, dir), nation))
    assert(spark.sql(s"SELECT * FROM graft_ingested('$dir')").count() == 2)
    val r2 = spark.sql(
      s"SELECT * FROM graft_copy_into('$dir', '$src2', 'csv')").head()
    assert(r2.getAs[Long]("files_loaded") == 0)
    assert(r2.getAs[Long]("files_skipped") == 2)
    // flags: 'force' re-loads; unknown flags refuse
    val rf = spark.sql(s"SELECT * FROM graft_copy_into('$dir', '$src2', " +
      "'csv', '*', 'force')").head()
    assert(rf.getAs[Long]("files_loaded") == 2)
    intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM graft_copy_into('$dir', '$src2', " +
        "'csv', '*', 'nope')").collect()
    }
  }
}
