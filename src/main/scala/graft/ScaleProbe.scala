package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The recurring 100×-scale probe (ad-hoc in round 18, a main since
  * round 19): a ×20 fact (3M rows at sf0.1) under a SCATTERED
  * merge-on-read churn — the shape where every file gains a deletion
  * vector, so a naive changed-files feed re-reads the whole table.
  * Prints one timing line per step; receipts land in ARCHITECTURE.md.
  *
  *   sbt "runMain graft.ScaleProbe /root/testdata/sf0.1"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val root = java.nio.file.Files.createTempDirectory("scaleprobe").toString
    val o = Tables.orders(spark, sfDir)
    // ×20 the fact with shifted keys: 3M rows at sf0.1, key space dense
    val fact20 = (0 until 20).map(i => o.select(
        (col("o_orderkey") + lit(i.toLong * 10000000L)).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice").as("price")))
      .reduce(_ unionByName _)
      // clustered by the DIM key: the layout the dim-term file-level
      // manifest pruning exists for (customer-centric fact layout)
      .repartitionByRange(32, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .localCheckpoint()
    val rows = fact20.count()
    println(s"[probe] fact rows: $rows")

    // --- star view over a database, scattered MOR churn ---
    val db = s"$root/db"
    graft.ops.DbLog.create(spark, db)
    // declared BEFORE the data lands: the ADD entries carry per-file
    // [min, max] on the dim key — what prunedFactOld prunes files by
    graft.ops.DbLog.setStatsColumns(spark, db, "fact", Seq("o_custkey"))
    val c = Tables.table(spark, sfDir, "customer")
    val n = Tables.table(spark, sfDir, "nation")
    timed("seed_txn")(graft.ops.DbLog.transact(spark, db, "seed") { txn =>
      txn.append("fact", fact20)
      txn.append("cust", c.select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg"), col("c_nationkey")))
      txn.append("nat", n.select(col("n_nationkey").as("c_nationkey"),
        col("n_name").as("nation_name")))
    })
    val view = graft.ops.DbMv.StarView("fact",
      Seq(("cust", Seq("o_custkey")), ("nat", Seq("c_nationkey"))),
      groupCols = Seq("seg", "nation_name"), sumCols = Seq("price"),
      minMaxCols = Seq("price"))
    timed("init_star")(graft.ops.DbMv.initStar(spark, db, "rev", view))
    // sum-only twin: isolates the dirty-group min/max recompute (an
    // O(rows-of-dirty-groups) term by design) from the feed costs
    timed("init_star_sumonly")(graft.ops.DbMv.initStar(spark, db, "revs",
      view.copy(minMaxCols = Nil)))
    // reserve twin: min/max maintained through bounded extreme
    // reserves — a scattered churn should advance at sum-only speed
    // (no prefix drains, no source recompute)
    timed("init_star_reserve")(graft.ops.DbMv.initStar(spark, db, "revr",
      view.copy(reserveK = 8)))
    // 0.1% scattered fact churn: %997 keys hit every one of the 32
    // files, so every entry gains a DV — the whole-read killer shape
    val bump = graft.ops.DbLog.snapshot(spark, db, "fact")
      .filter(pmod(col("o_orderkey"), lit(1993)) === 0)
      .withColumn("price", col("price") * 2).localCheckpoint()
    val dead = graft.ops.DbLog.snapshot(spark, db, "fact")
      .filter(pmod(col("o_orderkey"), lit(1997)) === 0)
      .select("o_orderkey").localCheckpoint()
    println(s"[probe] churn rows: bump=${bump.count()} dead=${dead.count()}")
    timed("churn_txn")(graft.ops.DbLog.transact(spark, db, "churn") { txn =>
      txn.applyKeyed("fact", Seq("o_orderkey"), bump, dead)
    })
    val fv = graft.ops.TxLog.currentVersion(spark, db)
    timed("fact_diff_only")(
      graft.ops.DbLog.diff(spark, db, "fact", fv - 1, fv).count())
    timed("fact_scan_only")(
      graft.ops.DbLog.snapshot(spark, db, "fact").count())
    timed("star_advance_scattered")(
      graft.ops.DbMv.refreshStar(spark, db, "rev"))
    timed("star_adv_scat_sumonly")(
      graft.ops.DbMv.refreshStar(spark, db, "revs"))
    timed("star_adv_scat_reserve")(
      graft.ops.DbMv.refreshStar(spark, db, "revr"))
    timed("star_noop")(graft.ops.DbMv.refreshStar(spark, db, "rev"))
    // dim-term advance: churn ONLY the cust dim (scattered keys), the
    // fact_old read is the term this probe watches
    val custUpd = graft.ops.DbLog.snapshot(spark, db, "cust")
      .filter(pmod(col("o_custkey"), lit(97)) === 0)
      .withColumn("seg", lit("MOVED")).localCheckpoint()
    graft.ops.DbLog.transact(spark, db, "dimchurn") { txn =>
      txn.upsertKeyed("cust", Seq("o_custkey"), custUpd)
    }
    timed("star_advance_dim")(graft.ops.DbMv.refreshStar(spark, db, "rev"))
    // CLUSTERED dim churn: keys in one narrow range — the fact's old
    // read should open a strict subset of its files (log manifest)
    val loK = c.agg(min("c_custkey")).head().getLong(0)
    val custClustered = graft.ops.DbLog.snapshot(spark, db, "cust")
      .filter(col("o_custkey").between(loK, loK + 300))
      .withColumn("seg", lit("NARROW")).localCheckpoint()
    println(s"[probe] clustered dim churn rows: ${custClustered.count()}")
    graft.ops.DbLog.transact(spark, db, "dimchurn2") { txn =>
      txn.upsertKeyed("cust", Seq("o_custkey"), custClustered)
    }
    timed("star_advance_dim_clustered")(
      graft.ops.DbMv.refreshStar(spark, db, "rev"))

    // --- keyless CDF over a tracked 3M-row table, 0.2% scattered churn ---
    val tdir = s"$root/tracked"
    fact20.write.parquet(tdir)
    graft.ops.TxLog.convert(spark, tdir) // v0
    timed("enable_tracking")(graft.ops.RowTracking.enable(spark, tdir)) // v1
    timed("scattered_dv_purge")(graft.ops.DeletionVectors.delete(spark, tdir,
      pmod(col("o_orderkey"), lit(499)) === 0)) // v2: ~0.2%, every file
    val feedN = timed("keyless_cdf_advance")(
      graft.ops.TxLog.changes(spark, tdir, 1, 2, Nil).count())
    println(s"[probe] keyless feed rows: $feedN")

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
